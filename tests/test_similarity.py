"""Similarity-search operators vs numpy models."""

from __future__ import annotations

import numpy as np
import pytest

from zcurve_spark.operators.similarity import (
    ann_topk,
    cosine_neardup_pairs,
    lsh_cosine_candidates,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    e.count()
    return e


@pytest.fixture(scope="module")
def mats(emb):
    pdf = emb.toPandas()
    ids = pdf.vec_id.to_numpy()
    M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    Q = np.floor(M * 100).astype(np.int64)  # the quantization the engine uses
    return ids, Q


def test_ann_topk_matches_numpy(emb, mats):
    ids, Q = mats
    k = 5
    got = ann_topk(emb, [0, 1, 2], k).toPandas()
    for qid in (0, 1, 2):
        qv = Q[ids == qid][0]
        dots = Q @ qv
        order = sorted(
            [(int(d), int(i)) for d, i in zip(dots, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )[:k]
        g = got[got.qid == qid].sort_values("rank")
        assert list(g.vec_id) == [i for _, i in order]
        assert list(g["dot"]) == [d for d, _ in order]  # .dot is a pandas method


def test_neardup_exact_matches_numpy(emb, mats):
    ids, Q = mats
    got = cosine_neardup_pairs(emb).toPandas()
    got_pairs = set(map(tuple, got[["a_id", "b_id"]].values.tolist()))
    n2 = (Q * Q).sum(axis=1)
    G = Q @ Q.T
    expect = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = int(G[i, j])
            if d > 0 and 4 * d * d >= int(n2[i]) * int(n2[j]):
                expect.add((int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))))
    assert got_pairs == expect


def test_lsh_recall_on_strong_pairs(emb, mats):
    """LSH candidates must contain most high-cosine pairs (recall check;
    exactness is the verify step's job)."""
    ids, Q = mats
    n2 = (Q * Q).sum(axis=1).astype(np.float64)
    G = (Q @ Q.T).astype(np.float64)
    cos = G / np.sqrt(np.outer(n2, n2))
    strong = [
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if cos[i, j] >= 0.8
    ]
    cand = lsh_cosine_candidates(emb, n_planes=16, n_bands=8).toPandas()
    cand_pairs = set(map(tuple, cand[["a_id", "b_id"]].values.tolist()))
    if strong:
        recall = len(set(strong) & cand_pairs) / len(strong)
        assert recall >= 0.8, f"LSH recall {recall} on {len(strong)} strong pairs"


def test_lsh_verified_subset_of_exact(emb, mats):
    got_lsh = cosine_neardup_pairs(emb, use_lsh=True, n_planes=16, n_bands=8).toPandas()
    got_exact = cosine_neardup_pairs(emb).toPandas()
    lp = set(map(tuple, got_lsh[["a_id", "b_id"]].values.tolist()))
    ep = set(map(tuple, got_exact[["a_id", "b_id"]].values.tolist()))
    assert lp <= ep  # verification removes all false positives


def test_lsh_default_params_find_exact_pairs(emb):
    """Round-1 defect: the shipped query used untested defaults (4-band)
    and returned 0 of 1 true pair.  Defaults now match the tested config;
    the near-dup pair set found by the exact path must be recovered."""
    got_lsh = cosine_neardup_pairs(emb, use_lsh=True).toPandas()
    got_exact = cosine_neardup_pairs(emb).toPandas()
    lp = set(map(tuple, got_lsh[["a_id", "b_id"]].values.tolist()))
    ep = set(map(tuple, got_exact[["a_id", "b_id"]].values.tolist()))
    assert lp <= ep
    if ep:
        recall = len(lp & ep) / len(ep)
        assert recall >= 0.8, f"default-param LSH recall {recall} on {len(ep)} pairs"


def test_lsh_recall_sf01_strong_pairs(spark):
    """Recall >= 0.8 on strong (cos >= 0.8) pairs at sf0.1 — the scale the
    driver benches at, not just the tiny sf0.001 fixture."""
    e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    pdf = e.toPandas()
    ids = pdf.vec_id.to_numpy()
    M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    Q = np.floor(M * 100).astype(np.int64)
    n2 = (Q * Q).sum(axis=1).astype(np.float64)
    G = (Q @ Q.T).astype(np.float64)
    cos = G / np.sqrt(np.outer(n2, n2))
    iu = np.triu_indices(len(ids), k=1)
    strong_idx = [(i, j) for i, j in zip(*iu) if cos[i, j] >= 0.8]
    strong = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))) for i, j in strong_idx
    }
    cand = lsh_cosine_candidates(e).toPandas()
    cand_pairs = set(map(tuple, cand[["a_id", "b_id"]].values.tolist()))
    if strong:
        recall = len(strong & cand_pairs) / len(strong)
        assert recall >= 0.8, f"LSH recall {recall} on {len(strong)} strong pairs at sf0.1"


def test_ivf_topk_recall_vs_exact(spark, emb, mats):
    """IVF-flat with nprobe=4/16 cells: results are a subset of the
    corpus with exact dots; recall@5 vs the exact path must be high on
    this small corpus, and nprobe=n_cells must equal the exact path."""
    from zcurve_spark.operators.similarity import ivf_topk

    ids, Q = mats
    k = 5
    qids = [0, 1, 2, 3]
    exact = ann_topk(emb, qids, k).toPandas()
    ivf = ivf_topk(emb, qids, k, n_cells=16, nprobe=4).toPandas()
    # dots are exact within probed cells
    by_id = {int(i): Q[ids == i][0] for i in ids}
    for r in ivf.itertuples():
        assert int(by_id[r.qid] @ by_id[r.vec_id]) == r.dot
    hit = 0
    for qid in qids:
        e = set(exact[exact.qid == qid].vec_id)
        g = set(ivf[ivf.qid == qid].vec_id)
        hit += len(e & g)
    assert hit / (len(qids) * k) >= 0.6, f"IVF recall {hit/(len(qids)*k)}"
    # full probe == exact
    full = ivf_topk(emb, qids, k, n_cells=16, nprobe=16).toPandas()
    pd_exact = exact.sort_values(["qid", "rank"]).reset_index(drop=True)
    pd_full = full.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert pd_full.equals(pd_exact)


def test_rademacher_kernel_equivalence(emb):
    """The scale-path sketch kernel (posexplode -> per-plane codegen'd
    sum aggs) must be BIT-IDENTICAL to the HOF Column twin — proof the
    r3 performance rewrite changed no values."""
    from pyspark.sql import functions as F

    from zcurve_spark.operators.similarity import (
        _rademacher_sketch,
        rademacher_sketches,
    )

    ref = {
        r.id: list(r.sk)
        for r in emb.select(
            F.col("vec_id").alias("id"), _rademacher_sketch("embedding", 16).alias("sk")
        ).collect()
    }
    got = {r.id: list(r.sk) for r in rademacher_sketches(emb, n_planes=16).collect()}
    assert got == ref


def test_ivf_routing_kernel_equivalence(emb):
    """Arrow-matmul cell routing must match the Column-expression twin
    exactly (same quantization, same first-max tiebreak)."""
    from pyspark.sql import functions as F

    from zcurve_spark.operators.similarity import (
        ivf_cell_expr,
        ivf_cell_udf,
        ivf_seeds,
    )

    seeds = ivf_seeds(emb, 16, lloyd_iters=0)
    ref = {
        r.id: r.c
        for r in emb.select(
            F.col("vec_id").alias("id"), ivf_cell_expr("embedding", seeds).alias("c")
        ).collect()
    }
    got = {
        r.id: r.c
        for r in emb.select(
            F.col("vec_id").alias("id"), ivf_cell_udf("embedding", seeds).alias("c")
        ).collect()
    }
    assert got == ref


def test_ivf_lloyd_seeds_deterministic_and_balanced(emb):
    """Lloyd refinement is partitioning-independent (exact int sums +
    floor division) and must not worsen cell balance vs raw seeds."""
    from pyspark.sql import functions as F

    from zcurve_spark.operators.similarity import ivf_cell_udf, ivf_seeds

    s1 = ivf_seeds(emb, 8, lloyd_iters=2)
    s2 = ivf_seeds(emb.repartition(7), 8, lloyd_iters=2)
    assert s1 == s2

    def max_cell(seeds):
        counts = (
            emb.select(ivf_cell_udf("embedding", seeds).alias("c"))
            .groupBy("c").count().collect()
        )
        return max(r["count"] for r in counts)

    assert max_cell(s1) <= max_cell(ivf_seeds(emb, 8, lloyd_iters=0))


def test_lloyd_fused_stats_match_explode_agg(emb):
    """The fused mapInPandas Lloyd stats kernel (r6) must refine seeds
    bit-identically to the explicit explode + hash-aggregate shape it
    replaced: same quantization (floor(float64(x) * QUANT)), exact
    integer sums/counts, same floor division."""
    from pyspark.sql import functions as F

    from zcurve_spark.operators.similarity import QUANT, ivf_cell_udf, ivf_seeds

    n_cells = 8
    raw = ivf_seeds(emb, n_cells, lloyd_iters=0)
    # reference: one refinement round via the old explode+agg pipeline
    stats = (
        emb.select(
            ivf_cell_udf("embedding", raw).alias("cell"),
            F.posexplode(F.col("embedding")).alias("pos", "v"),
        )
        .select(
            "cell",
            "pos",
            F.floor(F.col("v") * F.lit(float(QUANT))).cast("long").alias("q"),
        )
        .groupBy("cell", "pos")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_cell: dict[int, dict[int, int]] = {}
    for r in stats:
        by_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = int(r["s"]) // int(r["n"])
    ref = [
        [by_cell[c][p] for p in range(len(raw[c]))] if c in by_cell else raw[c]
        for c in range(n_cells)
    ]
    assert ivf_seeds(emb, n_cells, lloyd_iters=1) == ref


def test_ivf_topk_batch_matches_per_query(spark, emb):
    """Set-oriented IVF must equal the per-query path exactly — same
    seeds, same probe order (stable argsort == driver loop tiebreak),
    same within-cell ranking — at partial AND full probe counts, and
    through the non-broadcast join shape."""
    import pandas as pd

    from zcurve_spark.operators.similarity import ivf_topk, ivf_topk_batch

    qids = [0, 1, 2, 3, 7]
    qdf = spark.createDataFrame([(int(i),) for i in qids], "qid long")
    for nprobe in (4, 16):
        ref = (
            ivf_topk(emb, qids, 5, n_cells=16, nprobe=nprobe)
            .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        )
        for bc in (True, False):
            got = (
                ivf_topk_batch(emb, qdf, 5, n_cells=16, nprobe=nprobe, broadcast_queries=bc)
                .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, ref), (nprobe, bc)


def test_ivf_topk_batch_shuffle_plan_no_probe_broadcast(spark, emb):
    """r3 VERDICT #8 plan audit: with broadcast_queries=False the probe
    relation must NOT be broadcast — corpus and probes cogroup by cell
    (FlatMapCoGroupsInPandas over two shuffle exchanges), so 10^5+-query
    batches never materialize on every executor and the per-pair HOF dot
    relation never exists."""
    import io
    from contextlib import redirect_stdout

    from zcurve_spark.operators.similarity import ivf_topk_batch

    qdf = spark.createDataFrame([(int(i),) for i in range(8)], "qid long")
    out = ivf_topk_batch(emb, qdf, 5, n_cells=16, nprobe=4, broadcast_queries=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapCoGroupsInPandas" in plan, plan[:2000]
    # the only broadcast allowed is the tiny qid-lookup join (O(query
    # ids)); the cogroup's own inputs must be shuffle exchanges, which
    # is structural: cogroup cannot take a broadcast side at all.
    # formatted explain lists each node twice (tree + detail) — count
    # detail-section nodes only.
    bx = [
        l for l in plan.splitlines()
        if l.strip().startswith("(") and "BroadcastExchange" in l
    ]
    assert len(bx) <= 1, plan[:2000]


def test_ivf_seeds_store_reuse_zero_lloyd(spark, emb, tmp_path):
    """r4 VERDICT #4: the coarse quantizer is a build-once artifact —
    the second get_or_build with the same (fingerprint, n_cells) must
    return identical seeds WITHOUT running ivf_seeds (zero Lloyd jobs,
    asserted via the module build counter), and the cached seeds must
    leave ivf_topk results unchanged."""
    import pandas as pd

    from zcurve_spark.operators import similarity as S

    store = S.IvfSeedsStore(str(tmp_path / "seeds"))
    s1 = store.get_or_build(emb, 16, "fp-emb-v1")
    builds_after_first = S._IVF_SEED_BUILDS
    s2 = store.get_or_build(emb, 16, "fp-emb-v1")
    assert s2 == s1
    assert S._IVF_SEED_BUILDS == builds_after_first  # cache hit: no build
    # different key -> rebuild
    store.get_or_build(emb, 8, "fp-emb-v1")
    assert S._IVF_SEED_BUILDS == builds_after_first + 1
    # results through the store == results with inline seeds
    ref = (
        S.ivf_topk(emb, [0, 1, 2], 5, n_cells=16, nprobe=4)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    got = (
        S.ivf_topk(emb, [0, 1, 2], 5, n_cells=16, nprobe=4,
                   seeds_store=(store, "fp-emb-v1"))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)


def test_ivf_cogroup_q_chunk_identical_on_skewed_cell(spark, emb):
    """r4 VERDICT #8: a pathologically hot cell (>= 50% of corpus AND
    queries routed to one cell) must produce bit-identical results with
    a tiny q_chunk (many chunks -> peak matmul allocation capped at
    q_chunk * |cell| int64s) as with an effectively-unchunked run and
    as with the broadcast path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from zcurve_spark.operators import similarity as S

    # corpus: 60 of 120 vectors share a dominant direction -> one hot
    # cell; the rest scatter (deterministic LCG directions)
    dim = 8
    rows = []
    for i in range(120):
        if i % 2 == 0:
            v = [5.0 + 0.001 * i] + [0.01 * ((i * 7) % 5)] * (dim - 1)
        else:
            h = (i * 2654435761 + 11) % 97
            v = [0.2 * ((h + j * 13) % 7 - 3) for j in range(dim)]
        rows.append((i, [float(x) for x in v]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seeds = S.ivf_seeds(e, 4)
    # confirm the skew premise: one cell holds >= 50% of the corpus
    cells = e.select(S.ivf_cell_udf("embedding", seeds).alias("c")).toPandas()["c"]
    assert cells.value_counts().iloc[0] >= 60
    qdf = e.select(F.col("vec_id").alias("qid"))
    kw = dict(n_cells=4, nprobe=2, seeds=seeds)
    ref = (
        S.ivf_topk_batch(e, qdf, 5, broadcast_queries=True, **kw)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    for qc in (7, 10**9):
        got = (
            S.ivf_topk_batch(e, qdf, 5, broadcast_queries=False, q_chunk=qc, **kw)
            .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref)
