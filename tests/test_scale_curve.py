"""The scale-curve synthetic derivation (tools/scale_curve.py) is a pure,
deterministic function of a base sf dir — these tests pin its contract at a
tiny factor so the committed sf0.1→sf1 curve (r10 verdict #3) rests on a
verified generator, not an eyeballed one:

* every scaled table has exactly factor× the base rows; region/nation stay
  constant-size (TPC-H semantics: fixed dimensions at any SF);
* copy 0 is bit-identical to the base (queries keyed on literal ids keep
  their query set against the bigger corpus);
* referential integrity holds WITHIN each shifted copy (orders.o_custkey
  resolves in customer for every copy, lineitem.l_orderkey in orders);
* cross-copy documents are NOT verbatim clones (letter rotation) and
  cross-copy embeddings are not identical (cyclic shift) — without this the
  dedup/LSH operators would pay a C(factor,2)-per-entity pair blowup that
  real scaled data does not have, poisoning the curve;
* the _SCALE_META fingerprint makes the build idempotent.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
FACTOR = 2


def _synth(spark, tmp_path_factory):
    from tools.scale_curve import ensure_synth

    out = str(tmp_path_factory.getbasetemp() / "scale_synth")
    ensure_synth(spark, BASE, out, FACTOR)
    return out


def test_row_counts_and_idempotence(spark, tmp_path_factory):
    from csv_parquet_s3_spark.sources.tables import TABLES, load_table
    from tools.scale_curve import ensure_synth

    out = _synth(spark, tmp_path_factory)
    for t in TABLES:
        base_n = load_table(spark, BASE, t).count()
        synth_n = load_table(spark, out, t).count()
        want = base_n if t in ("region", "nation") else base_n * FACTOR
        assert synth_n == want, f"{t}: {synth_n} != {want}"
    # fingerprint match → rebuild skipped (returns 0.0 build seconds)
    assert ensure_synth(spark, BASE, out, FACTOR) == 0.0


def test_copy0_identity_and_fk_integrity(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from csv_parquet_s3_spark.sources.tables import load_table
    from tools.scale_curve import KEY_SHIFT

    out = _synth(spark, tmp_path_factory)

    # copy 0 of documents is bit-identical to the base
    base_docs = load_table(spark, BASE, "documents")
    synth0 = load_table(spark, out, "documents").filter(
        F.col("doc_id") < KEY_SHIFT
    )
    assert synth0.exceptAll(base_docs).count() == 0
    assert base_docs.exceptAll(synth0).count() == 0

    # FKs resolve within every copy: no orphan o_custkey / l_orderkey
    cust = load_table(spark, out, "customer")
    orders = load_table(spark, out, "orders")
    li = load_table(spark, out, "lineitem")
    assert (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_anti"
        ).count()
        == 0
    )
    assert (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").count()
        == 0
    )


def test_cross_copy_content_diverges(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from csv_parquet_s3_spark.sources.tables import load_table
    from tools.scale_curve import KEY_SHIFT

    out = _synth(spark, tmp_path_factory)

    # documents: copy 1's text must differ from copy 0's for (almost) every
    # doc — letter rotation perturbs any text containing a..j
    docs = load_table(spark, out, "documents").select(
        (F.col("doc_id") % KEY_SHIFT).alias("base_id"),
        (F.col("doc_id") / KEY_SHIFT).cast("int").alias("copy"),
        "text",
        "n_chars",
    )
    joined = (
        docs.filter(F.col("copy") == 0)
        .alias("a")
        .join(docs.filter(F.col("copy") == 1).alias("b"), "base_id")
    )
    n = joined.count()
    same = joined.filter(F.col("a.text") == F.col("b.text")).count()
    assert n > 0 and same < n * 0.01, f"{same}/{n} cross-copy texts identical"
    # translation is length-preserving, so the stored n_chars stays honest
    assert (
        joined.filter(F.col("a.n_chars") != F.col("b.n_chars")).count() == 0
    )

    # embeddings: copy 1 is a cyclic shift, not a verbatim clone
    emb = load_table(spark, out, "embeddings").select(
        (F.col("vec_id") % KEY_SHIFT).alias("base_id"),
        (F.col("vec_id") / KEY_SHIFT).cast("int").alias("copy"),
        "embedding",
    )
    ej = (
        emb.filter(F.col("copy") == 0)
        .alias("a")
        .join(emb.filter(F.col("copy") == 1).alias("b"), "base_id")
    )
    en = ej.count()
    esame = ej.filter(F.col("a.embedding") == F.col("b.embedding")).count()
    assert en > 0 and esame < en * 0.01
    # shift preserves the component multiset (it is a permutation)
    assert (
        ej.filter(
            F.expr("array_sort(a.embedding) != array_sort(b.embedding)")
        ).count()
        == 0
    )
