"""Structured Streaming ingest of the interleaved-document table.

The reference is strictly batch (SURVEY §2.9) and the north rule is a batch
job, so streaming is an *additional* capability, not a parity requirement:
new document files (the shape of an Iceberg commit feed) are discovered by
a file-source stream and flow through the SAME operators as the batch path —
``qi_percentages`` is a deterministic per-document map, so it lifts to
streaming unchanged (mapInPandas is streaming-compatible; no state needed).

Late/out-of-order scenes are handled with an event-time watermark on
``acquisition_time`` for the windowed rollup; exactly-once delivery comes
from the standard checkpoint + idempotent-sink contract of Structured
Streaming (the streaming analog of the batch path's lineage table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.decode import qi_percentages
from ..sources.docs import SPAN_SCHEMA


def stream_documents(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over a document-table directory (each new parquet
    file = one micro-batch increment — the Iceberg-commit-feed stand-in)."""
    return (
        spark.readStream
        .schema(f"doc_id string, spans {SPAN_SCHEMA.simpleString()}")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_qi(doc_stream: DataFrame) -> DataFrame:
    """Per-document QI rows (scene metadata + SCL class percentages) over a
    document stream — the batch operator applied unchanged (stateless map)."""
    return qi_percentages(doc_stream)


def streaming_scene_counts(doc_stream: DataFrame,
                           window: str = "10 days",
                           watermark: str = "30 days") -> DataFrame:
    """Watermarked tumbling-window rollup: scenes and cloud statistics per
    (tileid, acquisition window), tolerating ``watermark`` of event-time
    lateness. Output mode: append (finalized windows only) or update."""
    qi = streaming_qi(doc_stream)
    return (
        qi.withWatermark("acquisition_time", watermark)
        .groupBy(F.window("acquisition_time", window).alias("w"), "tileid")
        .agg(F.count("*").alias("n_scenes"),
             F.avg(F.col("CLOUD_HIGH_PROBA")
                   + F.col("CLOUD_MEDIUM_PROBA")).alias("avg_cloud_frac"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "tileid", "n_scenes", "avg_cloud_frac")
    )


def streaming_sessions(events: DataFrame, key: str = "user_id",
                       ts_col: str = "ts", gap: str = "6 hours",
                       watermark: str = "1 day") -> DataFrame:
    """Streaming sessionization via Spark's native ``session_window``:
    per-key sessions that extend while consecutive events arrive within
    ``gap``, with watermarked state eviction (a closed session's state is
    dropped once the watermark passes its end — bounded state on an
    unbounded stream). The streaming analog of the batch
    ``operators/temporal.sessionize``.

    Boundary semantics differ from the batch operator by a half-open
    interval: ``session_window`` ends are EXCLUSIVE (an event at exactly
    ``last_ts + gap`` starts a new session) while the batch operator's
    strict ``> gap`` test keeps it in-session. Identical for any stream
    without exact-gap collisions (continuous-time events).

    Emits one row per (key, session): ``session_start`` (first event),
    ``session_end_gap`` (last event + gap, exclusive), ``n_events``.
    Session-window aggregations support output modes ``append``
    (finalized sessions only, watermark-driven — the production mode)
    and ``complete``; ``update`` is rejected by Spark.
    """
    # event-time (watermark) columns must be TIMESTAMP, not TIMESTAMP_NTZ —
    # pin the session timezone to UTC upstream so the cast binds the same
    # instants the batch operator's unix_micros sees
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                 F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(key,
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end_gap"),
                "n_events")
    )


def content_fingerprint():
    """md5 of the span sequence — the document content identity (building
    the higher-order-function lambda requires an active session, hence a
    factory instead of a module-level Column)."""
    return F.md5(F.concat_ws(
        "\x1e", F.transform("spans", lambda s: F.concat_ws(
            "\x1f", s["kind"], s["text"], s["media_ref"]))))


def streaming_first_seen(doc_stream: DataFrame) -> DataFrame:
    """Custom STATEFUL streaming operator (``applyInPandasWithState``):
    exactly-once content dedup over an unbounded document stream.

    Keyed by the content fingerprint (md5 of the span sequence — the same
    identity the batch ``exact_dedup`` keeper uses), the state holds
    (first-seen doc_id, running count); each micro-batch emits the updated
    row per touched fingerprint (output mode ``update``). This is the
    streaming analog of the batch exact-dedup keeper table: downstream
    sinks treat ``first_doc_id`` as the canonical copy and ``n_seen > 1``
    as the duplicate signal. State is partitioned by the fingerprint key —
    the state store shards across executors like any keyed aggregation.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = doc_stream.select(
        "doc_id", content_fingerprint().alias("fingerprint"))

    def update_fn(key, pdfs, state):
        if state.exists:
            first, n = state.get
        else:
            first, n = None, 0
        ids = []
        for pdf in pdfs:
            ids.extend(pdf["doc_id"].tolist())
        ids.sort()
        if first is None and ids:
            first = ids[0]
        n += len(ids)
        state.update((first, n))
        yield pd.DataFrame({"fingerprint": [key[0]],
                            "first_doc_id": [first],
                            "n_seen": [n]})

    return keyed.groupBy("fingerprint").applyInPandasWithState(
        update_fn,
        outputStructType="fingerprint string, first_doc_id string, n_seen long",
        stateStructType="first_doc_id string, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_zscore(events: DataFrame, key: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     window: int = 24, min_periods: int = 8,
                     z_thresh: float = 2.5) -> DataFrame:
    """Streaming point-anomaly detection — the stateful analog of the
    batch ``temporal.rolling_zscore``: per key, the state is a ring
    buffer of the last ``window`` observations; each arriving event is
    scored against the buffer (self-excluded, population std) and then
    appended.

    State is O(window) doubles per key — constant, shardable, and
    checkpoint-friendly; output mode ``append`` (one scored row per
    event, exactly once per trigger). Matches the batch operator exactly
    when each key's events arrive in timestamp order (micro-batches are
    sorted internally; cross-batch reordering beyond the buffer depth is
    the usual streaming caveat and the reason the batch operator remains
    the backfill path).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    sel = events.select(key, ts_col, value_col)
    out_schema = (f"{key} long, {ts_col} timestamp, value double, "
                  f"n_prev int, z double, is_anomaly boolean")

    def update_fn(k, pdfs, state):
        buf = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts_col)
        o_ts, o_v, o_n, o_z, o_f = [], [], [], [], []
        for r in rows.itertuples(index=False):
            v = getattr(r, value_col)
            n = len(buf)
            z = None
            if n >= min_periods:
                a = np.asarray(buf, dtype=np.float64)
                m = a.mean()
                sd = float(np.sqrt(np.maximum(
                    (a * a).mean() - m * m, 0.0)))
                if sd > 0:
                    z = float((v - m) / sd)
            o_ts.append(getattr(r, ts_col))
            o_v.append(v)
            o_n.append(n)
            o_z.append(z)
            o_f.append(bool(z is not None and abs(z) > z_thresh))
            buf.append(float(v))
            if len(buf) > window:
                buf = buf[-window:]
        state.update((buf,))
        yield pd.DataFrame({key: [k[0]] * len(o_v), ts_col: o_ts,
                            "value": o_v, "n_prev": o_n, "z": o_z,
                            "is_anomaly": o_f})

    return sel.groupBy(key).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType="buf array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_kmv(doc_stream: DataFrame, k: int = 256, n_shards: int = 8,
                  text_col: str = "text") -> DataFrame:
    """Streaming distinct-count sketch — the stateful analog of the
    batch ``sketch.kmv_distinct``: per shard (hash-mod of the mixed
    token hash), the state is the shard's k smallest distinct hashes;
    every trigger emits the shard's current sketch row.

    The shard split is what makes the sketch both PARALLEL and
    mergeable: a globally small hash is necessarily small within its
    shard, so the union of shard sketches contains the global k
    minimum — merge with ``unique → first k`` (see the parity test) and
    the estimate is BIT-IDENTICAL to the batch operator on the same
    data, regardless of batch boundaries or arrival order (state is a
    set; reordering cannot change it). State: ≤ k longs per shard,
    constant; output mode append, one row per active shard per trigger
    (the latest row per shard IS the shard's sketch).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.sampling import portable_hash
    from ..operators.sketch import _mix

    toks = F.explode(F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)).alias("token")
    hs = (doc_stream.select(toks)
          .select(_mix(portable_hash(F.col("token"))).alias("h"))
          .withColumn("shard",
                      F.pmod(F.col("h"), F.lit(n_shards)).cast("int")))

    def update_fn(key, pdfs, state):
        cur = (np.asarray(state.get[0], dtype=np.int64)
               if state.exists else np.empty(0, dtype=np.int64))
        batches = [p["h"].to_numpy(dtype=np.int64) for p in pdfs]
        merged = np.unique(np.concatenate([cur] + batches))[:k]
        state.update((merged.tolist(),))
        yield pd.DataFrame({
            "shard": [int(key[0])],
            "n_kept": [int(merged.size)],
            "kth_hash": [int(merged[-1]) if merged.size else None],
            "sketch": [merged.tolist()],
        })

    return hs.groupBy("shard").applyInPandasWithState(
        update_fn,
        outputStructType=("shard int, n_kept int, kth_hash long, "
                         "sketch array<long>"),
        stateStructType="mins array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_transitions(events: DataFrame, key: str = "user_id",
                          type_col: str = "event_type",
                          ts_col: str = "ts") -> DataFrame:
    """Streaming behavior-transition extraction — the stateful analog of
    the batch ``temporal.transition_counts``: per key, the state is the
    type of the last event seen; each arriving event emits one
    ``(from_type, to_type)`` pair row and becomes the new state, so the
    downstream matrix is a plain streaming (or batch, post-sink) count
    over the pair stream.

    State is ONE string per key — constant and checkpoint-friendly.
    Matches the batch operator's pair multiset exactly when each key's
    events arrive in timestamp order across triggers (micro-batches are
    sorted internally on (ts, type); cross-batch reordering is the usual
    streaming caveat and the batch operator remains the backfill path).
    Output mode append: one row per event that has a predecessor.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    sel = events.select(key, type_col, ts_col)
    out_schema = (f"{key} long, from_type string, to_type string, "
                  f"{ts_col} timestamp")

    def update_fn(k, pdfs, state):
        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, type_col])
        o_f, o_t, o_ts = [], [], []
        for r in rows.itertuples(index=False):
            t = getattr(r, type_col)
            if last is not None:
                o_f.append(last)
                o_t.append(t)
                o_ts.append(getattr(r, ts_col))
            last = t
        if last is not None:
            state.update((last,))
        yield pd.DataFrame({key: [k[0]] * len(o_f), "from_type": o_f,
                            "to_type": o_t, ts_col: o_ts})

    return sel.groupBy(key).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType="last string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cusum(events: DataFrame, key: str = "user_id",
                    ts_col: str = "ts", value_col: str = "value",
                    mu0: float = 0.0, sigma0: float = 1.0,
                    k: float = 0.5, h: float = 4.0) -> DataFrame:
    """Streaming CUSUM drift detection — the stateful analog of the
    batch ``temporal.cusum_alarms``, standardized against a FIXED
    calibration reference ``(mu0, sigma0)`` (a stream cannot see its
    own full-series moments; the batch operator is the calibration /
    backfill path). State per key: ``(sp, sn, n_alarms)`` — three
    numbers, constant, checkpoint-friendly. Emits one row per event
    with the post-update state and the alarm flag; alarms reset the
    sums (Page's rule).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    sel = events.select(key, ts_col, value_col)
    out_schema = (f"{key} long, {ts_col} timestamp, value double, "
                  f"sp double, sn double, alarmed boolean, "
                  f"n_alarms long")

    def update_fn(kk, pdfs, state):
        sp, sn, na = (state.get if state.exists else (0.0, 0.0, 0))
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, value_col])
        o = {"ts": [], "v": [], "sp": [], "sn": [], "al": [], "na": []}
        for r in rows.itertuples(index=False):
            v = float(getattr(r, value_col))
            z = (v - mu0) / sigma0 if sigma0 > 0 else 0.0
            sp = max(0.0, sp + z - k)
            sn = max(0.0, sn - z - k)
            alarmed = sp > h or sn > h
            if alarmed:
                na += 1
                sp = sn = 0.0
            o["ts"].append(getattr(r, ts_col))
            o["v"].append(v)
            o["sp"].append(sp)
            o["sn"].append(sn)
            o["al"].append(alarmed)
            o["na"].append(na)
        state.update((sp, sn, na))
        yield pd.DataFrame({key: [kk[0]] * len(o["v"]), ts_col: o["ts"],
                            "value": o["v"], "sp": o["sp"],
                            "sn": o["sn"], "alarmed": o["al"],
                            "n_alarms": o["na"]})

    return sel.groupBy(key).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType="sp double, sn double, na long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _psi_bin(v, lo: float, hi: float, n_bins: int):
    """The batch `inference.psi` bin rule verbatim: [-1] underflow,
    [n_bins] overflow, else floor((v−lo)/width) clamped to the top bin."""
    width = (float(hi) - float(lo)) / n_bins
    raw = F.floor((v - float(lo)) / F.lit(width)).cast("long")
    return (F.when(v < lo, F.lit(-1))
            .when(v >= hi, F.lit(n_bins))
            .otherwise(F.least(raw, F.lit(n_bins - 1))).cast("int"))


def psi_reference(calib: DataFrame, value_col: str, lo: float,
                  hi: float, n_bins: int = 10,
                  smooth: float = 0.5) -> list:
    """Build the FIXED expected-distribution vector a streaming PSI
    monitor compares against: the Laplace-smoothed bin fractions of a
    batch calibration slice (the training window), one float per bin
    including under/overflow — (n_bins + 2) numbers, collected to the
    driver because that IS the deployment artifact (it ships with the
    model, not with the stream)."""
    v = F.col(value_col)
    counts = (calib.filter(v.isNotNull())
              .groupBy(_psi_bin(v, lo, hi, n_bins).alias("bin"))
              .agg(F.count("*").cast("double").alias("c")))
    got = {r["bin"]: r["c"] for r in counts.collect()}
    nb = float(n_bins + 2)
    tot = sum(got.values())
    return [(got.get(b, 0.0) + smooth) / (tot + smooth * nb)
            for b in range(-1, n_bins + 1)]


def streaming_psi(events: DataFrame, expected: list,
                  value_col: str = "value", ts_col: str = "ts",
                  lo: float = 0.0, hi: float = 200.0, n_bins: int = 10,
                  smooth: float = 0.5, window: str = "1 day",
                  watermark: str = "2 days") -> DataFrame:
    """Streaming model-monitoring drift: per event-time window, the
    Population Stability Index of ``value_col``'s binned distribution
    against the fixed calibration vector from :func:`psi_reference` —
    the stateful analog of the batch ``inference.psi`` (which compares
    two slices of one bounded table; a stream compares each window to
    the shipped reference).

    State: ONE windowed aggregation whose row is (n_bins + 2)
    conditional counters — constant per window, watermark-evicted;
    the PSI fold over those counters is a stateless projection with
    the expected fractions inlined as literals (they are deployment
    constants, not data). Append mode emits each window's PSI once,
    when the watermark closes it. Same decision thresholds as batch:
    <0.1 stable, 0.1–0.25 drifting, >0.25 retrain.
    """
    if len(expected) != n_bins + 2:
        raise ValueError(
            f"streaming_psi: expected vector must have n_bins+2="
            f"{n_bins + 2} entries, got {len(expected)}")
    v = F.col(value_col)
    b = _psi_bin(v, lo, hi, n_bins)
    bins = list(range(-1, n_bins + 1))
    counts = (events.filter(v.isNotNull())
              .withWatermark(ts_col, watermark)
              .groupBy(F.window(F.col(ts_col), window).alias("w"))
              .agg(*[F.sum(F.when(b == bb, 1.0).otherwise(0.0))
                     .alias(f"c_{i}") for i, bb in enumerate(bins)]))
    nb = float(n_bins + 2)
    total = sum((F.col(f"c_{i}") for i in range(len(bins))),
                F.lit(0.0))
    n_obs = total
    psi_terms = []
    for i, bb in enumerate(bins):
        pa = (F.col(f"c_{i}") + float(smooth)) \
            / (total + float(smooth) * nb)
        pe = float(expected[i])
        psi_terms.append((pa - pe) * F.log(pa / F.lit(pe)))
    psi = sum(psi_terms[1:], psi_terms[0])
    return counts.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        n_obs.cast("long").alias("n_obs"),
        (F.round(psi, 6) + 0.0).alias("psi"))


def streaming_heavy_hitters(doc_stream: DataFrame, k: int = 64,
                            n_shards: int = 8,
                            text_col: str = "text") -> DataFrame:
    """Stateful streaming Misra-Gries — the candidate half of the batch
    ``sketch.heavy_hitters`` lifted onto an unbounded token stream:
    tokens shard by the portable hash, each shard's state is an MG(k)
    counter summary (≤ k (token, count) pairs — bounded regardless of
    vocabulary growth), and every trigger emits the shard's current
    summary rows.

    Guarantees carry over from the batch analysis: a token with true
    stream count > (total tokens)/k cannot be evicted from its shard's
    summary, and shard summaries merge by addition (same token never
    spans shards — the shard IS a hash partition of the vocabulary),
    so the merged summary is a superset of every φ-heavy token for
    φ ≥ 1/k. When a shard's observed alphabet fits its k counters, MG
    never decrements and the summary is EXACT — the parity test pins
    the merged stream summary to the batch token counts bit-for-bit in
    that regime; past it, the batch operator's exact verify pass is
    the backfill path, exactly as with the other stream/batch twins.

    State: two parallel arrays (≤ k strings + longs) per shard,
    arrival-order-dependent only when evictions occur (documented MG
    property). Output mode append; the LATEST rows per shard are the
    shard's summary.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.sampling import portable_hash

    toks = F.explode(
        F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    hs = (doc_stream.select(toks)
          .withColumn("shard",
                      F.pmod(portable_hash(F.col("token")),
                             F.lit(n_shards)).cast("int")))

    def update_fn(key, pdfs, state):
        if state.exists:
            names, counts = state.get
            mg = dict(zip(list(names), [int(c) for c in counts]))
        else:
            mg = {}
        for pdf in pdfs:
            for t in pdf["token"]:
                if t is None:
                    continue
                if t in mg:
                    mg[t] += 1
                elif len(mg) < k:
                    mg[t] = 1
                else:
                    dead = []
                    for key2 in mg:
                        mg[key2] -= 1
                        if mg[key2] == 0:
                            dead.append(key2)
                    for key2 in dead:
                        del mg[key2]
        state.update((list(mg.keys()), [int(v) for v in mg.values()]))
        yield pd.DataFrame({
            "shard": [int(key[0])] * len(mg),
            "token": list(mg.keys()),
            "lb": [int(v) for v in mg.values()],
        })

    return hs.groupBy("shard").applyInPandasWithState(
        update_fn,
        outputStructType="shard int, token string, lb long",
        stateStructType="names array<string>, counts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_attribution(events: DataFrame,
                          conversion_types=("purchase",),
                          touch_types=("view", "click"),
                          lookback_seconds: float = 86400.0,
                          key: str = "user_id", ts_col: str = "ts",
                          type_col: str = "event_type") -> DataFrame:
    """Stateful streaming last-touch attribution
    (``applyInPandasWithState``): per user, the state carries the most
    recent qualifying touch (ts + type); every conversion event emits
    one attributed row as it arrives — the real-time twin of the batch
    `temporal.attribution` (last-touch columns; journey first-touch is
    a batch-side readout). State per key is ONE (timestamp, type)
    pair — constant memory, sharded by the user key like any keyed
    aggregation.

    Correctness contract (pinned in test_streaming): over a
    time-ordered replay, the emitted (user, conv_ts, last_touch_type,
    in_window) multiset equals the batch operator's. Events inside one
    micro-batch are sorted by (ts, type) before the state fold, so
    batch boundaries never reorder a user's stream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    conv = set(conversion_types)
    touch = set(touch_types)
    keyed = events.select(
        F.col(key).alias("k"),
        F.col(ts_col).cast("timestamp").alias("t"),
        F.col(type_col).alias("ty"))

    def update_fn(kv, pdfs, state):
        if state.exists:
            lt_us, lt_ty = state.get
        else:
            lt_us, lt_ty = None, None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["t", "ty"])
            for t, ty in zip(pdf["t"], pdf["ty"]):
                t_us = int(pd.Timestamp(t).value // 1000)
                if ty in conv:
                    in_w = (lt_us is not None
                            and (t_us - lt_us) / 1e6
                            <= lookback_seconds)
                    rows.append((str(kv[0]), t, ty, lt_ty,
                                 bool(in_w)))
                if ty in touch:
                    lt_us, lt_ty = t_us, ty
        if lt_us is not None:
            state.update((lt_us, lt_ty))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "conv_ts", "conv_type", "last_touch_type",
                "in_window"])

    return keyed.groupBy("k").applyInPandasWithState(
        update_fn,
        outputStructType=("user_id string, conv_ts timestamp, "
                         "conv_type string, last_touch_type string, "
                         "in_window boolean"),
        stateStructType="lt_us long, lt_ty string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
