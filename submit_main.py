#!/usr/bin/env python
"""spark-submit entrypoint for the resumable pipeline (north rule).

Usage on a cluster (N or 4N executors — the code is identical):

    zip -r zcurve_spark.zip zcurve_spark
    spark-submit --py-files zcurve_spark.zip \
        --num-executors $N --executor-cores 4 \
        submit_main.py --sf-dir <input> --work-dir <checkpoint dir>

Re-running with the same --work-dir resumes: completed stages are
detected via their manifest fingerprints and skipped.
"""

from zcurve_spark.pipeline import main

if __name__ == "__main__":
    main()
