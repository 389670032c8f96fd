"""Fused suite (suite/fused.py) must agree check-by-check with the
classic one-job-per-check phases on the same generated interleaved
table — the fusion moves WHERE each aggregate runs (CollectMetrics on a
shared scan), never WHAT it computes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schematic_spark.generator import (
    GeneratorConfig,
    INTERLEAVED_SPEC,
    exploded_spans,
    interleaved_documents,
    media_dim,
    non_monotonic_docs,
)
from schematic_spark.suite import (
    chi2_drift,
    column_stats,
    dangling_rows,
    duplicate_keys_salted,
    ks_drift,
    run_fused_suite,
)
from schematic_spark.validation import validate

N_DOCS = 4000
KINDS = ("text", "media", "bogus")


@pytest.fixture(scope="module")
def data(spark):
    cfg = GeneratorConfig(n_docs=N_DOCS, seed=42, n_media=500)
    cfg_base = GeneratorConfig(n_docs=N_DOCS, seed=7, n_media=500)
    docs = interleaved_documents(spark, cfg).cache()
    base = interleaved_documents(spark, cfg_base).cache()
    media = media_dim(spark, cfg.n_media).cache()
    docs.count(), base.count(), media.count()
    yield docs, base, media
    docs.unpersist(), base.unpersist(), media.unpersist()


@pytest.fixture(scope="module")
def fused(data):
    docs, base, media = data
    return run_fused_suite(
        docs, base, media, INTERLEAVED_SPEC,
        kind_values=KINDS, ks_lo=0, ks_hi=16, ks_buckets=16,
        salt_buckets=64,
    )


class TestFusedMatchesClassic:
    def test_verdict_summary(self, data, fused):
        docs, _, _ = data
        classic = {
            r["verdict"]: r["n_rows"]
            for r in validate(docs, INTERLEAVED_SPEC).summary().collect()
        }
        assert fused.verdicts == classic
        assert fused.n_docs == N_DOCS

    def test_violation_total(self, data, fused):
        docs, _, _ = data
        classic = (
            validate(docs, INTERLEAVED_SPEC)
            .summary()
            .agg(F.sum("n_violations"))
            .collect()[0][0]
        )
        assert fused.n_violations == classic

    def test_column_stats(self, data, fused):
        docs, _, _ = data
        classic = {r["column"]: r.asDict() for r in column_stats(docs).collect()}
        got = {r["column"]: r for r in fused.column_stats}
        assert set(got) == set(classic)
        for c, exp in classic.items():
            for k, v in exp.items():
                g = got[c][k]
                if isinstance(v, float):
                    assert g == pytest.approx(v, rel=1e-9), (c, k)
                else:
                    assert g == v, (c, k)

    def test_span_order(self, data, fused):
        docs, _, _ = data
        assert fused.n_non_monotonic == non_monotonic_docs(docs).count()

    def test_uniqueness(self, data, fused):
        docs, _, _ = data
        assert fused.n_dup_keys == duplicate_keys_salted(
            docs, "doc_id", salt_buckets=64
        ).count()

    def test_referential(self, data, fused):
        docs, _, media = data
        spans = exploded_spans(docs).where(F.col("media_ref").isNotNull())
        assert fused.n_dangling == dangling_rows(
            spans, media, "media_ref", broadcast=True
        ).count()

    def test_ks_drift(self, data, fused):
        docs, base, _ = data
        classic = ks_drift(
            docs.select(F.size("spans").alias("n")),
            base.select(F.size("spans").alias("n")),
            "n", lo=0, hi=16, n_buckets=16,
        )
        assert fused.ks.statistic == pytest.approx(classic.statistic, rel=1e-12)
        assert fused.ks.p_value == pytest.approx(classic.p_value, rel=1e-12)
        assert fused.ks.detail == classic.detail

    def test_chi2_drift(self, data, fused):
        docs, base, _ = data
        classic = chi2_drift(
            exploded_spans(docs).select("kind"),
            exploded_spans(base).select("kind"),
            "kind",
        )
        assert fused.chi2.statistic == pytest.approx(
            classic.statistic, rel=1e-12
        )
        assert fused.chi2.p_value == pytest.approx(classic.p_value, rel=1e-12)
        assert fused.chi2.detail == classic.detail

    def test_timings_shape(self, fused):
        assert set(fused.timings) == {
            "fact_rowlocal_uniqueness", "spans_referential", "baseline_drift",
        }


class TestFusedEdgeCases:
    def test_hist_aggs_drop_nulls_like_numeric_histogram(self, spark):
        """greatest() skips NULLs, so an unguarded bucket expression
        counts NULL values into bucket 0; the classic path filters
        isNotNull before bucketing. Both must agree on nullable input."""
        from pyspark.sql import Observation

        from schematic_spark.suite.drift import numeric_histogram
        from schematic_spark.suite.fused import _hist_aggs

        df = spark.createDataFrame(
            [(0.0,), (None,), (3.5,), (None,), (15.9,), (99.0,)],
            "n double",
        )
        obs = Observation("hist_nulls")
        df.observe(obs, *_hist_aggs("n", 0.0, 16.0, 16)).count()
        fused_hist = {
            b: v for b in range(16)
            if (v := (obs.get[f"__b{b}"] or 0)) > 0
        }
        classic = {
            r["bucket"]: r["n"]
            for r in numeric_histogram(
                df, "n", lo=0.0, hi=16.0, n_buckets=16
            ).collect()
        }
        assert fused_hist == classic
        assert sum(fused_hist.values()) == 4  # the two NULLs fell out

    def test_kind_values_reserved_sentinels_rejected(self):
        from schematic_spark.suite.fused import _kind_aggs

        with pytest.raises(ValueError, match="__null__"):
            _kind_aggs(F.lit("x"), ("text", "__null__"))
        with pytest.raises(ValueError, match="__other__"):
            _kind_aggs(F.lit("x"), ("__other__",))
