"""Native (sparse exponential) histograms: codec roundtrips, classic
expansion math, and the WAL drain -> PromQL histogram_quantile chain."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsdb_parquet_spark.histograms import (
    NativeHistogram,
    bucket_upper_bound,
    decode_histogram_samples_record,
    encode_histogram_samples_record,
    expand_to_classic,
    format_le,
)
from tsdb_parquet_spark.tsdb_wal import WalWriter, wal_to_histogram_frame


def _h(**kw):
    base = dict(schema=2, count=6.0, sum=12.5, zero_threshold=0.001,
                zero_count=1.0,
                positive_spans=((0, 2), (3, 1)),
                positive_buckets=(2.0, 1.0, 2.0))
    base.update(kw)
    return NativeHistogram(**base)


def test_bucket_upper_bounds_schema_math():
    # schema 0: base 2 — bucket i covers (2^(i-1), 2^i]
    assert bucket_upper_bound(0, 1) == 2.0
    assert bucket_upper_bound(0, 3) == 8.0
    # schema 2: base 2^(1/4)
    assert bucket_upper_bound(2, 4) == pytest.approx(2.0)
    assert bucket_upper_bound(2, 8) == pytest.approx(4.0)
    # schema -1: base 4
    assert bucket_upper_bound(-1, 2) == 16.0
    # negative side: bucket i covers [-base^i, -base^(i-1))
    assert bucket_upper_bound(0, 2, sign=-1) == -2.0
    with pytest.raises(ValueError):
        bucket_upper_bound(9, 1)


def test_expand_to_classic_cumulative_and_order():
    h = _h()
    rows = expand_to_classic("lat", {"job": "a"}, 1000, h)
    buckets = [(r[1]["le"], r[3]) for r in rows if r[0] == "lat_bucket"]
    les = [float(le) if le != "+Inf" else math.inf for le, _ in buckets]
    assert les == sorted(les)  # le-ascending
    counts = [c for _, c in buckets]
    assert counts == sorted(counts)  # cumulative, monotone
    # zero bucket first (no negative side), then spans 0,1 and 5
    assert buckets[0] == (format_le(0.001), 1.0)
    assert float(buckets[1][0]) == pytest.approx(
        bucket_upper_bound(2, 0)
    )
    assert buckets[-1] == ("+Inf", 6.0)
    count_row = next(r for r in rows if r[0] == "lat_count")
    sum_row = next(r for r in rows if r[0] == "lat_sum")
    assert count_row[3] == 6.0 and sum_row[3] == 12.5
    assert "le" not in count_row[1]


def test_expand_negative_buckets_order():
    h = NativeHistogram(
        schema=0, count=3.0, sum=-5.0,
        negative_spans=((1, 2),), negative_buckets=(1.0, 2.0),
    )
    rows = expand_to_classic("m", {}, 0, h)
    buckets = [(r[1]["le"], r[3]) for r in rows if r[0] == "m_bucket"]
    # negative bucket idx 1 covers [-2,-1) -> le -1; idx 2 -> le -2;
    # most-negative le FIRST with its count, cumulative after
    assert buckets[0] == (format_le(-2.0), 2.0)
    assert buckets[1] == (format_le(-1.0), 3.0)
    assert buckets[-1] == ("+Inf", 3.0)


def test_record_roundtrip_integer_and_float():
    entries = [
        (7, 1000, _h()),
        (9, 2000, _h(count=2.0, zero_count=0.0,
                     positive_spans=((2, 1),), positive_buckets=(2.0,),
                     negative_spans=((0, 1),), negative_buckets=(0.0,))),
    ]
    for float_kind in (False, True):
        blob = encode_histogram_samples_record(entries, float_kind)
        assert blob[0] == (0x08 if float_kind else 0x07)
        back = decode_histogram_samples_record(blob)
        assert back == entries


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2**20),            # ref
            st.integers(-(2**40), 2**40),     # ts
            st.integers(-4, 8),               # schema
            st.lists(st.integers(0, 50), min_size=0, max_size=5),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_record_roundtrip_property(raw):
    entries = []
    for ref, ts, schema, counts in raw:
        entries.append(
            (
                ref,
                ts,
                NativeHistogram(
                    schema=schema,
                    count=float(sum(counts)),
                    sum=float(len(counts)),
                    positive_spans=((0, len(counts)),) if counts else (),
                    positive_buckets=tuple(float(c) for c in counts),
                ),
            )
        )
    blob = encode_histogram_samples_record(entries)
    assert decode_histogram_samples_record(blob) == entries


def test_wal_histogram_drain_to_quantile(spark, tmp_path):
    """WAL histogram records -> distributed drain -> classic expansion
    -> PromQL histogram_quantile, end to end.  Two series, two scrape
    times; the quantile interpolates inside the known rank bucket."""
    from tsdb_parquet_spark.plans.promql import PromQLEngine

    wal = str(tmp_path)
    w = WalWriter(wal)
    w.log_series([(1, {"__name__": "lat", "job": "a"}),
                  (2, {"__name__": "lat", "job": "b"})])
    # schema 0 (base 2): buckets (1,2], (2,4], (4,8] with counts 2/6/2
    h1 = NativeHistogram(schema=0, count=10.0, sum=30.0,
                         positive_spans=((1, 3),),
                         positive_buckets=(2.0, 6.0, 2.0))
    # job b: all mass in (4,8]
    h2 = NativeHistogram(schema=0, count=4.0, sum=24.0,
                         positive_spans=((3, 1),),
                         positive_buckets=(4.0,))
    w.log_histograms([(1, 60_000, h1), (2, 60_000, h2)])
    w.close()
    df = wal_to_histogram_frame(spark, wal, ["__name__", "job"])
    rows = sorted(
        (r["__name__"], r["job"], r["le"], r["value"])
        for r in df.collect()
    )
    assert ("lat_count", "a", "", 10.0) in rows
    assert ("lat_sum", "b", "", 24.0) in rows
    # cumulative 2+6; le formatted Go-'g' style ("4", not "4.0") so
    # expanded buckets merge with genuinely scraped classic series
    assert ("lat_bucket", "a", "4", 8.0) in rows
    # quantile: median of job a sits in (2,4] -> 2 + (5-2)/6 * 2 = 3.0
    engine = PromQLEngine(df)
    out = engine.query_range(
        "histogram_quantile(0.5, lat_bucket)", 60_000, 60_000, 60_000
    ).collect()
    got = {r["job"]: r["value"] for r in out}
    assert got["a"] == pytest.approx(3.0)
    # job b: all mass in its LOWEST occupied bucket (4,8] — classic
    # histogram_quantile interpolates the first bucket from 0
    # (Prometheus's own rule), so 0 + 0.5*8 = 4.0; the reduction trades
    # the native lower bound for classic semantics here, documented in
    # histograms.py
    assert got["b"] == pytest.approx(4.0)


def test_remote_write_histogram_roundtrip_both_versions():
    from tsdb_parquet_spark.remote_write import (
        decode_histograms,
        encode_write_request,
        frame_payload,
        unframe_payload,
    )

    h1 = _h()
    h2 = NativeHistogram(schema=0, count=3.0, sum=9.0,
                         negative_spans=((1, 1),),
                         negative_buckets=(3.0,))
    series = [
        ({"__name__": "lat", "job": "a"}, [], (), [(1000, h1)]),
        ({"__name__": "lat", "job": "b"}, [(1000, 1.0)], (),
         [(1000, h2), (2000, h1)]),
    ]
    for version in (1, 2):
        body = frame_payload(encode_write_request(series, version))
        got = decode_histograms(unframe_payload(body))
        assert len(got) == 2
        by_job = {labels["job"]: hists for labels, hists in got}
        assert by_job["a"] == [(1000, h1)]
        assert by_job["b"] == [(1000, h2), (2000, h1)]


def test_remote_write_histogram_frame_to_quantile(spark):
    """POST bodies carrying native histograms -> executor-side decode +
    classic expansion -> PromQL histogram_quantile."""
    from tsdb_parquet_spark.plans.promql import PromQLEngine
    from tsdb_parquet_spark.remote_write import (
        encode_write_request,
        frame_payload,
        remote_write_histogram_frame,
    )

    h = NativeHistogram(schema=0, count=10.0, sum=30.0,
                        positive_spans=((1, 3),),
                        positive_buckets=(2.0, 6.0, 2.0))
    bodies = [
        frame_payload(encode_write_request(
            [({"__name__": "lat", "job": "a"}, [], (), [(60_000, h)])],
            version=v,
        ))
        for v in (1, 2)
    ]
    payloads = spark.createDataFrame(
        [(b,) for b in bodies], "payload binary"
    )
    frame = remote_write_histogram_frame(payloads, ["__name__", "job"])
    # the two payloads carry the SAME series/ts — PromQL's instant
    # lookback dedups to one sample per (series, ts) via last-point,
    # so the duplicate is harmless; check the raw expansion first
    rows = frame.collect()
    assert len(rows) == 2 * 6  # 4 buckets(+Inf incl) + count + sum, x2
    engine = PromQLEngine(frame.dropDuplicates(["__name__", "job", "le", "ts"]))
    out = engine.query_range(
        "histogram_quantile(0.5, lat_bucket)", 60_000, 60_000, 60_000
    ).collect()
    assert len(out) == 1 and out[0]["value"] == pytest.approx(3.0)


def test_receiver_spool_histogram_ingest_to_store(spark, tmp_path):
    """A remote-write spool whose payloads carry BOTH float samples and
    native histograms drains into one store (histograms=True): expanded
    bucket series land with their `le` label, floats with le="", and
    the store serves histogram_quantile directly."""
    import os

    from pyspark.sql import functions as F

    from tsdb_parquet_spark.chunks import chunks_to_samples
    from tsdb_parquet_spark.plans.promql import PromQLEngine
    from tsdb_parquet_spark.remote_write import (
        encode_write_request,
        frame_payload,
    )
    from tsdb_parquet_spark.streaming.receiver import (
        remote_write_spool_ingestor,
    )

    spool = str(tmp_path / "spool")
    root = str(tmp_path / "store")
    os.makedirs(spool)
    h = NativeHistogram(schema=0, count=10.0, sum=30.0,
                        positive_spans=((1, 3),),
                        positive_buckets=(2.0, 6.0, 2.0))
    body = frame_payload(encode_write_request(
        [
            ({"__name__": "up", "job": "a"}, [(60_000, 1.0)], (), ()),
            ({"__name__": "lat", "job": "a"}, [], (), [(60_000, h)]),
        ],
        version=2,
    ))
    with open(os.path.join(spool, "req-0.bin"), "wb") as fh:
        fh.write(body)
    labels = ["__name__", "job", "le"]
    ingestor, stream = remote_write_spool_ingestor(
        spark, spool, root, labels, histograms=True
    )
    ingestor.ingest(stream)
    compact = ingestor.finalize()
    samples = chunks_to_samples(spark.read.parquet(compact), labels)
    rows = sorted(
        (r["__name__"], r["le"], r["value"]) for r in samples.collect()
    )
    assert ("up", "", 1.0) in rows
    assert ("lat_count", "", 10.0) in rows
    assert ("lat_bucket", "+Inf", 10.0) in rows
    out = PromQLEngine(samples).query_range(
        "histogram_quantile(0.5, lat_bucket)", 60_000, 60_000, 60_000
    ).collect()
    assert len(out) == 1 and out[0]["value"] == pytest.approx(3.0)
    # without "le" in the labels, histograms=True refuses loudly
    with pytest.raises(ValueError, match='"le"'):
        remote_write_spool_ingestor(
            spark, spool, root, ["__name__", "job"], histograms=True
        )


@settings(max_examples=80, deadline=None)
@given(
    schema=st.integers(-4, 8),
    zero_count=st.integers(0, 5),
    pos=st.lists(
        st.tuples(st.integers(-30, 30), st.integers(1, 20)),
        max_size=4,
    ),
    neg=st.lists(
        st.tuples(st.integers(-30, 30), st.integers(1, 20)),
        max_size=3,
    ),
)
def test_expand_invariants_property(schema, zero_count, pos, neg):
    """For ANY well-formed sparse histogram: bucket les strictly
    ascending, cumulative counts monotone, +Inf equals count, count row
    equals count, and the bucket rows' increments sum to the mass in
    finite buckets."""

    def build_side(items):
        # occupied indexes strictly ascending -> spans with gaps
        idxs = sorted({i for i, _ in items})
        counts = {i: float(c) for i, c in items}
        spans, buckets = [], []
        prev_end = 0
        run = None
        for i in idxs:
            if run is not None and i == run[0] + run[1]:
                run = (run[0], run[1] + 1)
            else:
                if run is not None:
                    spans.append((run[0] - prev_end, run[1]))
                    prev_end = run[0] + run[1]
                run = (i, 1)
            buckets.append(counts[i])
        if run is not None:
            spans.append((run[0] - prev_end, run[1]))
        return tuple(spans), tuple(buckets)

    ps, pb = build_side(pos)
    ns, nb = build_side(neg)
    bucket_mass = sum(pb) + sum(nb) + zero_count
    h = NativeHistogram(
        schema=schema,
        count=bucket_mass + 3,  # 3 observations only +Inf accounts for
        sum=1.0,
        zero_threshold=1e-9 if zero_count else 0.0,
        zero_count=float(zero_count),
        positive_spans=ps,
        positive_buckets=pb,
        negative_spans=ns,
        negative_buckets=nb,
    )
    rows = expand_to_classic("m", {}, 0, h)
    buckets = [(r[1]["le"], r[3]) for r in rows if r[0] == "m_bucket"]
    les = [float(le) if le != "+Inf" else math.inf for le, _ in buckets]
    assert les == sorted(les) and len(set(les)) == len(les)
    cnts = [c for _, c in buckets]
    assert all(a <= b for a, b in zip(cnts, cnts[1:]))
    assert buckets[-1] == ("+Inf", h.count)
    if len(buckets) > 1:
        assert cnts[-2] == pytest.approx(bucket_mass)
    # codec roundtrip of the same histogram (both kinds)
    for fk in (False, True):
        (got,) = decode_histogram_samples_record(
            encode_histogram_samples_record([(1, 0, h)], float_kind=fk)
        )
        assert got == (1, 0, h)


def test_histogram_fraction_engine(spark):
    """histogram_fraction over classic buckets: piecewise-linear CDF,
    +Inf mass only at an infinite bound, from-0 lowest bucket — and
    inverse-consistency with histogram_quantile."""
    from pyspark.sql import Row

    from tsdb_parquet_spark.plans.promql import PromQLEngine

    # buckets (1,2]:2  (2,4]:6  (4,8]:2  +Inf:+2 (total 12)
    rows = [
        Row(__name__="lat_bucket", job="a", le="2.0", ts=60_000, value=2.0),
        Row(__name__="lat_bucket", job="a", le="4.0", ts=60_000, value=8.0),
        Row(__name__="lat_bucket", job="a", le="8.0", ts=60_000, value=10.0),
        Row(__name__="lat_bucket", job="a", le="+Inf", ts=60_000,
            value=12.0),
    ]
    engine = PromQLEngine(spark.createDataFrame(rows))

    def frac(lo, hi):
        out = engine.query_range(
            f"histogram_fraction({lo}, {hi}, lat_bucket)",
            60_000, 60_000, 60_000,
        ).collect()
        assert len(out) == 1
        return out[0]["value"]

    # whole real line: everything incl. +Inf mass
    assert frac("-Inf", "+Inf") == pytest.approx(1.0)
    # finite full range: +Inf bucket's mass is NOT below any finite x
    assert frac(0, 8) == pytest.approx(10 / 12)
    # inside one bucket: linear — (2,4] holds 6; [2,3] is half of it
    assert frac(2, 3) == pytest.approx(3 / 12)
    # straddling buckets: [3,6] = half of (2,4] + half of (4,8]
    assert frac(3, 6) == pytest.approx((3 + 1) / 12)
    # lowest bucket interpolates from 0 (the quantile-consistent rule)
    assert frac(0, 1) == pytest.approx(1 / 12)
    # inverse consistency: C(quantile(q)) == q for q inside finite mass
    q = 0.5
    qv = engine.query_range(
        f"histogram_quantile({q}, lat_bucket)", 60_000, 60_000, 60_000
    ).collect()[0]["value"]
    assert frac("-Inf", qv) == pytest.approx(q)


def test_histogram_fraction_native_chain(spark, tmp_path):
    """histogram_fraction over buckets produced by the NATIVE reduction
    (WAL drain) — the previously-excluded native function family's
    flagship, now served end-to-end."""
    from tsdb_parquet_spark.plans.promql import PromQLEngine

    wal = str(tmp_path)
    w = WalWriter(wal)
    w.log_series([(1, {"__name__": "lat", "job": "a"})])
    h = NativeHistogram(schema=0, count=10.0, sum=30.0,
                        positive_spans=((1, 3),),
                        positive_buckets=(2.0, 6.0, 2.0))
    w.log_histograms([(1, 60_000, h)])
    w.close()
    frame = wal_to_histogram_frame(spark, wal, ["__name__", "job"])
    out = PromQLEngine(frame).query_range(
        "histogram_fraction(2, 4, lat_bucket)", 60_000, 60_000, 60_000
    ).collect()
    # bucket (2,4] holds 6 of 10 observations
    assert len(out) == 1 and out[0]["value"] == pytest.approx(0.6)


def test_histogram_fraction_inverted_interval_is_zero(spark):
    """Prometheus histogramFraction: lower >= upper holds no mass —
    0 per series, not an error."""
    from pyspark.sql import Row

    from tsdb_parquet_spark.plans.promql import PromQLEngine

    rows = [
        Row(__name__="lat_bucket", job="a", le="2.0", ts=60_000, value=2.0),
        Row(__name__="lat_bucket", job="a", le="+Inf", ts=60_000, value=4.0),
    ]
    out = PromQLEngine(spark.createDataFrame(rows)).query_range(
        "histogram_fraction(5, 3, lat_bucket)", 60_000, 60_000, 60_000
    ).collect()
    assert len(out) == 1 and out[0]["value"] == 0.0


def test_data_dir_convert_with_histograms_composition(spark, tmp_path):
    """The `cli convert --data-dir --histograms` composition at library
    level: floats from the WAL land with le="", native-histogram
    records land classic-expanded, one mixed compact serves PromQL
    quantiles AND plain queries."""
    from tsdb_parquet_spark.chunks import chunks_to_samples, samples_to_chunks
    from tsdb_parquet_spark.plans.promql import PromQLEngine
    from tsdb_parquet_spark.schema import label_columns, sort_columns
    from tsdb_parquet_spark.sources.writer import (
        SortedParquetWriter,
        WriterOptions,
    )
    from tsdb_parquet_spark.tsdb_wal import data_dir_to_chunk_frame

    data = str(tmp_path / "data")
    wal = data + "/wal"
    out = str(tmp_path / "store")
    w = WalWriter(wal)
    w.log_series([(1, {"__name__": "up", "job": "a"}),
                  (2, {"__name__": "lat", "job": "a"})])
    w.log_samples([(1, 60_000, 1.0)])
    h = NativeHistogram(schema=0, count=10.0, sum=30.0,
                        positive_spans=((1, 3),),
                        positive_buckets=(2.0, 6.0, 2.0))
    w.log_histograms([(2, 60_000, h)])
    w.close()

    labels = ["__name__", "job", "le"]
    frame = data_dir_to_chunk_frame(spark, data, labels)
    cols = label_columns(frame.schema)
    opts = WriterOptions(sort_columns=sort_columns(cols))
    writer = SortedParquetWriter(spark, out, opts)
    writer.write(frame)
    from tsdb_parquet_spark.tsdb_wal import wal_to_histogram_frame

    hs = wal_to_histogram_frame(spark, wal, ["__name__", "job"])
    writer.write(samples_to_chunks(hs, labels, assign_series_ids=False))
    compact = writer.compact()
    samples = chunks_to_samples(spark.read.parquet(compact), labels)
    engine = PromQLEngine(samples)
    up = engine.query_range("up", 60_000, 60_000, 60_000).collect()
    assert len(up) == 1 and up[0]["value"] == 1.0
    q = engine.query_range(
        "histogram_quantile(0.5, lat_bucket)", 60_000, 60_000, 60_000
    ).collect()
    assert len(q) == 1 and q[0]["value"] == pytest.approx(3.0)


def test_histogram_accessors(spark, tmp_path):
    """histogram_count / histogram_sum / histogram_avg: exact sugar
    over the reduction's _count/_sum series."""
    from tsdb_parquet_spark.plans.promql import PromQLEngine

    wal = str(tmp_path)
    w = WalWriter(wal)
    w.log_series([(1, {"__name__": "lat", "job": "a"}),
                  (2, {"__name__": "lat", "job": "b"})])
    h1 = NativeHistogram(schema=0, count=10.0, sum=30.0,
                         positive_spans=((1, 3),),
                         positive_buckets=(2.0, 6.0, 2.0))
    h2 = NativeHistogram(schema=0, count=4.0, sum=24.0,
                         positive_spans=((3, 1),),
                         positive_buckets=(4.0,))
    w.log_histograms([(1, 60_000, h1), (2, 60_000, h2)])
    w.close()
    engine = PromQLEngine(wal_to_histogram_frame(spark, wal,
                                                 ["__name__", "job"]))

    def run(expr):
        return {
            r["job"]: r["value"]
            for r in engine.query_range(expr, 60_000, 60_000,
                                        60_000).collect()
        }

    assert run("histogram_count(lat)") == {"a": 10.0, "b": 4.0}
    assert run("histogram_sum(lat)") == {"a": 30.0, "b": 24.0}
    avg = run("histogram_avg(lat)")
    assert avg["a"] == pytest.approx(3.0)
    assert avg["b"] == pytest.approx(6.0)
    with pytest.raises(ValueError, match="plain instant selector"):
        engine.query_range("histogram_avg(sum(lat))", 60_000, 60_000,
                           60_000)


def test_format_le_go_g_compatible():
    """`le` strings match Go strconv.FormatFloat(v, 'g', -1, 64) —
    client_golang's bucket-bound formatting — so native-expanded
    buckets merge with genuinely scraped classic series."""
    cases = {
        1.0: "1",
        2.0: "2",
        0.5: "0.5",
        0.001: "0.001",
        100000.0: "100000",
        1000000.0: "1e+06",
        1234567.0: "1.234567e+06",
        123456.7: "123456.7",
        1e-05: "1e-05",
        0.0001: "0.0001",
        -2.0: "-2",
        -0.5: "-0.5",
        0.0: "0",
        1e100: "1e+100",
        2.0 ** 0.25: "1.189207115002721",
        math.inf: "+Inf",
        -math.inf: "-Inf",
    }
    for v, want in cases.items():
        assert format_le(v) == want, v
        if math.isfinite(v):
            # shortest-digit forms stay parse-exact
            assert float(format_le(v)) == v, v


def test_bucket_upper_bound_extreme_index_clamps_to_inf():
    """A wire-legal but extreme bucket index overflows float pow; the
    mass belongs to the +Inf / -Inf classic bucket, not a task error."""
    assert bucket_upper_bound(0, 1100) == math.inf
    assert bucket_upper_bound(0, 1100, sign=-1) == -math.inf
    assert bucket_upper_bound(-4, 70) == math.inf
    # a merely-large index that still fits stays exact
    assert bucket_upper_bound(0, 1000) == 2.0 ** 1000


def test_wal_histogram_frame_rejects_le_label(spark, tmp_path):
    """`le` in label_names would collide with the expansion's own
    bucket column — rejected at entry, not a late ambiguous select."""
    from tsdb_parquet_spark.tsdb_wal import WalWriter, wal_to_histogram_frame

    wal = str(tmp_path)
    w = WalWriter(wal)
    w.log_series([(1, {"__name__": "lat", "le": "x"})])
    w.close()
    with pytest.raises(ValueError, match="must not contain 'le'"):
        wal_to_histogram_frame(spark, wal, ["__name__", "le"])


def test_histogram_quantile_lowest_bucket_le_leq_zero(spark):
    """promql/quantile.go's lowest-bucket rule: a rank landing in the
    first bucket whose upper bound is <= 0 returns that bound (implicit
    lower bound -Inf); ranks in later buckets interpolate from the
    previous (possibly negative) bound as usual."""
    from pyspark.sql import Row

    from tsdb_parquet_spark.plans.promql import PromQLEngine

    # buckets: (-Inf,-4]:4  (-4,-1]:4  (-1,2]:2  +Inf: total 10
    rows = [
        Row(__name__="t_bucket", job="a", le="-4", ts=60_000, value=4.0),
        Row(__name__="t_bucket", job="a", le="-1", ts=60_000, value=8.0),
        Row(__name__="t_bucket", job="a", le="2", ts=60_000, value=10.0),
        Row(__name__="t_bucket", job="a", le="+Inf", ts=60_000, value=10.0),
    ]
    engine = PromQLEngine(spark.createDataFrame(rows))

    def q(phi):
        out = engine.query_range(
            f"histogram_quantile({phi}, t_bucket)", 60_000, 60_000, 60_000
        ).collect()
        return out[0]["value"]

    # rank 2 falls in the first bucket (le=-4 <= 0): return the bound
    assert q(0.2) == pytest.approx(-4.0)
    # rank 6 interpolates inside (-4,-1]: -4 + 3*(6-4)/4 = -2.5
    assert q(0.6) == pytest.approx(-2.5)
    # rank 9 interpolates inside (-1,2]: -1 + 3*(9-8)/2 = 0.5
    assert q(0.9) == pytest.approx(0.5)


def test_expanded_histograms_survive_block_export_convert(spark, tmp_path):
    """The classic expansion also round-trips the TSDB BLOCK lifecycle:
    drained le-series -> chunk frame -> export_blocks -> block convert
    back to a chunk frame -> PromQL histogram_quantile, identical to
    quantiling the drain directly (le is an ordinary label through the
    block index)."""
    from tsdb_parquet_spark.chunks import samples_to_chunks
    from tsdb_parquet_spark.plans.promql import PromQLEngine
    from tsdb_parquet_spark.querier import ChunkQuerier
    from tsdb_parquet_spark.tsdb_block import (
        blocks_to_chunk_frame,
        export_blocks,
    )

    wal = str(tmp_path / "wal")
    w = WalWriter(wal)
    w.log_series([(1, {"__name__": "lat", "job": "a"}),
                  (2, {"__name__": "lat", "job": "b"})])
    h1 = NativeHistogram(schema=0, count=10.0, sum=30.0,
                         positive_spans=((1, 3),),
                         positive_buckets=(2.0, 6.0, 2.0))
    h2 = NativeHistogram(schema=0, count=5.0, sum=-9.0,
                         negative_spans=((1, 2),),
                         negative_buckets=(3.0, 2.0))
    w.log_histograms([(1, 60_000, h1), (2, 60_000, h2)])
    w.close()
    labels = ["__name__", "job", "le"]
    frame = wal_to_histogram_frame(spark, wal, ["__name__", "job"])
    direct = {
        (r["job"],): r["value"]
        for r in PromQLEngine(frame).query_range(
            "histogram_quantile(0.5, lat_bucket)", 60_000, 60_000, 60_000
        ).collect()
    }
    chunks = samples_to_chunks(frame, labels, chunk_span_ms=86_400_000)
    out = export_blocks(chunks, str(tmp_path / "blocks"))
    assert out
    back = blocks_to_chunk_frame(
        spark, [p for _, p in out], labels
    )
    samples = ChunkQuerier(back).select_samples(labels=labels)
    got = {
        (r["job"],): r["value"]
        for r in PromQLEngine(samples).query_range(
            "histogram_quantile(0.5, lat_bucket)", 60_000, 60_000, 60_000
        ).collect()
    }
    assert got == direct
    # median of b interpolates inside (-2,-1]: -2 + 1*(2.5-2)/3
    assert got[("b",)] == pytest.approx(-2 + 0.5 / 3)
    # a lower rank lands in b's FIRST bucket (le=-2 <= 0): the
    # lowest-bucket rule applies through the block path too
    low = {
        (r["job"],): r["value"]
        for r in PromQLEngine(samples).query_range(
            "histogram_quantile(0.3, lat_bucket)", 60_000, 60_000, 60_000
        ).collect()
    }
    assert low[("b",)] == pytest.approx(-2.0)
