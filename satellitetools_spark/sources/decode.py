"""Chunk decode + AOI spatial join: media spans → long pixel table.

This is the engine's core scan operator (reference lifecycle stage 4,
wrappers.py:75 / aws.py:548-618): per document, decode COG chunk payloads,
assemble the buffered read window per band, resample to the target grid
(bilinear spectral / nearest SCL — raster.py:92-151 semantics), compute
pixel-center coordinates, and keep pixels whose center lies inside the AOI
polygon (rasterio ``mask(all_touched=False)`` semantics, raster.py:43-54).

Spark-first shape:
- the decode input is ONE narrow JVM projection per document — doc_id, the
  band-filtered media_ref array (single array ``filter`` pass) and the raw
  text spans. Document *metadata JSON is parsed in the Python pass itself*
  (stdlib json, once per document): evaluating per-field
  ``from_json``/``get_json_object`` for 16 dimension columns on the JVM
  costs tens of ms per document (each column expression re-locates and
  re-parses the span text), which at 10^12 documents would dwarf the decode
  itself. Shuffle volume scales with chunk-ref count, not pixel count.
- Point-in-polygon is accelerated with the engine's planar cell index:
  the AOI's cell cover (full/partial) is computed once per AOI and memoized
  per executor; pixels in fully-covered cells skip ray casting, only
  boundary-cell pixels are refined (vectorized NumPy).
"""

from __future__ import annotations

import json
from typing import Iterable, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geometry as G
from .. import rasterops as R
from ..constants import CELL_SIZE_M, S2_BANDS_10_20

_META_COLS = [
    "aoi", "tileid", "assetid", "productid", "acquisition_time",
    "sun_azimuth", "sun_zenith", "view_azimuth", "view_zenith",
]

_ANGLES = ("sun_azimuth", "sun_zenith", "view_azimuth", "view_zenith")

# transport record separator for packed span payloads (ASCII RS). JSON
# strings cannot contain a raw 0x1e (json escapes control chars), and the
# engine's media_ref scheme never emits one.
REF_SEP = "\x1e"


def _parse_doc_texts(row: dict) -> dict:
    """Parse the document's text spans (scene metadata + AOI record) into a
    flat dict — one stdlib-json parse per span, executed inside the Python
    pass. Returns the same keys the old JVM dimension projection produced.
    """
    meta, aoi = None, None
    for t in row["texts"].split(REF_SEP):
        if not t:
            continue
        d = json.loads(t)
        ty = d.get("type")
        if ty == "scene_meta":
            meta = d
        elif ty == "aoi":
            aoi = d
    out = {
        "doc_id": row["doc_id"],
        "aoi": aoi["name"],
        "aoi_geometry": json.dumps(aoi["geometry"]),
        "utm_zone": int(aoi["utm_zone"]),
        "target_gsd": float(aoi["target_gsd"]),
        "qi_scale": float(aoi.get("qi_evaluation_scale", 20.0)),
    }
    for k in ("productid", "assetid", "tileid", "projection",
              "datasource", "processing"):
        out[k] = meta[k]
    out["acquisition_time"] = np.datetime64(meta["acquisition_time"], "us")
    for k in _ANGLES:
        out[k] = float(meta[k])
    return out


def pixel_schema(bands: List[str]) -> T.StructType:
    fields = [
        T.StructField("doc_id", T.StringType()),
        T.StructField("aoi", T.StringType()),
        T.StructField("tileid", T.StringType()),
        T.StructField("assetid", T.StringType()),
        T.StructField("productid", T.StringType()),
        T.StructField("acquisition_time", T.TimestampType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("cell", T.LongType()),
    ]
    for b in bands:
        if b == "SCL":
            fields.append(T.StructField("SCL", T.IntegerType()))
        else:
            fields.append(T.StructField(b, T.DoubleType()))
    fields += [
        T.StructField("sun_azimuth", T.DoubleType()),
        T.StructField("sun_zenith", T.DoubleType()),
        T.StructField("view_azimuth", T.DoubleType()),
        T.StructField("view_zenith", T.DoubleType()),
        T.StructField("aoi_pixels", T.IntegerType()),
        T.StructField("gsd", T.DoubleType()),
    ]
    return T.StructType(fields)


# executor-local memo: AOI geometry → (rings_utm, cover, grid) per gsd
_AOI_CACHE: dict = {}


def _sorted_member(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``values`` in a sorted int64 array."""
    if len(sorted_arr) == 0:
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(sorted_arr, values)
    idx = np.minimum(idx, len(sorted_arr) - 1)
    return sorted_arr[idx] == values


def _aoi_grid(aoi_geometry: str, zone: int, gsd: float):
    key = (aoi_geometry, zone, gsd)
    hit = _AOI_CACHE.get(key)
    if hit is not None:
        return hit
    rings4326 = G.rings_from_geojson(aoi_geometry)
    rings_utm = G.project_rings_to_utm(rings4326, zone)
    bbox = G.rings_bounds(rings_utm)
    txs, tys = R.target_grid(bbox, gsd)
    cover = G.polygon_cell_cover(rings_utm, CELL_SIZE_M)
    x2, y2 = np.meshgrid(txs, tys)
    px, py = x2.ravel(), y2.ravel()
    cells = G.cell_id(px, py, CELL_SIZE_M)
    # cell-index classification: full-cover cells are inside without
    # refinement; partial (boundary) cells get vectorized ray casting
    is_full = _sorted_member(cells, cover["full"])
    is_part = _sorted_member(cells, cover["partial"])
    inside = is_full.copy()
    refine = is_part & ~is_full
    if refine.any():
        inside[refine] = G.points_in_rings(px[refine], py[refine], rings_utm)
    val = (txs, tys, px, py, cells, inside, int(inside.sum()))
    if len(_AOI_CACHE) > 256:
        _AOI_CACHE.clear()
    _AOI_CACHE[key] = val
    return val


_OUT_COLS_HEAD = ["doc_id", "aoi", "tileid", "assetid", "productid",
                  "acquisition_time", "x", "y", "cell"]
_OUT_COLS_TAIL = ["sun_azimuth", "sun_zenith", "view_azimuth",
                  "view_zenith", "aoi_pixels", "gsd"]

# vectorized NumPy twins of operators/indices.py (used when VI computation
# is fused into the decode pass — same IEEE semantics as the column exprs)
_VI_NUMPY = {
    "ndvi": lambda o: (o["B8A"] - o["B4"]) / (o["B8A"] + o["B4"]),
    "ci_red_edge": lambda o: o["B7"] / o["B5"] - 1.0,
    "gcc": lambda o: o["B3"] / (o["B2"] + o["B3"] + o["B4"]),
}

# docs per emitted output frame: bounds per-yield memory while amortizing
# the pandas→Arrow conversion over many documents
_DOCS_PER_FRAME = 128

# JVM media-ref prefilter kicks in at band subsets up to this size: each
# pattern costs one substring scan per ref in the scan stage, while the
# Python side skips non-matching refs nearly for free after one split —
# A/B measurement shows the prefilter only pays off when it prunes MOST
# refs (1-2-band narrow reads like the SCL-only QI pass); at 5+ bands the
# JVM string scans cost more than the Python-side skip they save
_PREFILTER_MAX = 2


def _decode_one(raw: dict, bands: List[str], gsd_override: Optional[float],
                vi_vars: List[str] = (), snap_vars: List[str] = (),
                parsed: Optional[dict] = None) -> dict:
    """Decode one document row → dict of column arrays (pixel rows)."""
    row = parsed if parsed is not None else _parse_doc_texts(raw)
    row["media_refs"] = raw["media_refs"]
    gsd = float(gsd_override if gsd_override is not None else row["target_gsd"])
    txs, tys, px, py, cells, inside, aoi_px = _aoi_grid(
        row["aoi_geometry"], int(row["utm_zone"]), gsd)

    by_band: dict = {}
    for ref in row["media_refs"].split(REF_SEP):
        if not ref:
            continue
        band = ref.split("/", 5)[4]
        if band in bands:
            by_band.setdefault(band, []).append(ref)

    n_in = int(inside.sum())
    out = {"doc_id": np.repeat(row["doc_id"], n_in)}
    for c in _META_COLS:
        out[c] = np.repeat(row[c], n_in)
    out["x"] = px[inside]
    out["y"] = py[inside]
    out["cell"] = cells[inside]
    for band in bands:
        band_refs = by_band.get(band, [])
        payloads = [(r, R.decode_chunk(r)) for r in band_refs]
        vals = R.render_band_on_grid(
            band, row["productid"], txs, tys,
            refs_with_payload=payloads or None,
        ).ravel()[inside]
        if band == "SCL":
            # partial chunk cover leaves NaN in the nearest-sampled class
            # raster; cast would fold it to a large negative int and
            # bincount would reject the whole task — map it to NO_DATA (0)
            vals = np.where(np.isfinite(vals), vals, 0.0)
            out[band] = vals.astype(np.int32)
        else:
            out[band] = vals
    with np.errstate(invalid="ignore", divide="ignore"):
        for vi in vi_vars:
            out[vi] = _VI_NUMPY[vi](out)
    if snap_vars:
        from ..biophys.nn import run_nn
        from ..constants import BIOPHYS_COLUMN, SNAP_BIO_BANDS
        ang = {c: float(row[c]) for c in ("sun_azimuth", "sun_zenith",
                                          "view_azimuth", "view_zenith")}
        feats = np.column_stack(
            [out[b] for b in SNAP_BIO_BANDS]
            + [np.full(n_in, np.cos(np.radians(ang["view_zenith"]))),
               np.full(n_in, np.cos(np.radians(ang["sun_zenith"]))),
               np.full(n_in, np.cos(np.radians(
                   ang["sun_azimuth"] - ang["view_azimuth"])))])
        for var in snap_vars:
            out[BIOPHYS_COLUMN[var]] = run_nn(feats, var)
    out["aoi_pixels"] = np.repeat(np.int32(aoi_px), n_in)
    out["gsd"] = np.repeat(gsd, n_in)
    return out


def _make_batch_decoder(bands: List[str], gsd_override: Optional[float],
                        vi_vars: List[str] = (), snap_vars: List[str] = (),
                        extra_cols: List[str] = ()):
    cols = _OUT_COLS_HEAD + bands + list(extra_cols) + _OUT_COLS_TAIL

    def decode_batches(batches):
        for pdf in batches:
            rows = pdf.to_dict("records")
            for i in range(0, len(rows), _DOCS_PER_FRAME):
                outs = [_decode_one(r, bands, gsd_override, vi_vars, snap_vars)
                        for r in rows[i:i + _DOCS_PER_FRAME]]
                yield pd.DataFrame(
                    {c: np.concatenate([o[c] for o in outs]) for c in cols})

    return decode_batches


def decode_documents(
    docs: DataFrame,
    bands: Optional[Iterable[str]] = None,
    gsd_override: Optional[float] = None,
    dim: Optional[DataFrame] = None,
    n_partitions: Optional[int] = None,
    vi_vars: Optional[Iterable[str]] = None,
    snap_vars: Optional[Iterable[str]] = None,
) -> DataFrame:
    """Decode media spans of ``docs`` into the long pixel DataFrame.

    ``bands`` limits decoding (projection pushdown analog: the media-span
    filter prunes unneeded chunks *before* any shuffle or decode work).
    ``gsd_override`` forces the output grid scale (the reference's separate
    ``qi_evaluation_scale``). ``dim`` is accepted for API compatibility but
    unused: the dimension columns are re-projected from the document row
    itself, which costs nothing (codegen) and keeps this a single-input
    operator.

    ``vi_vars`` / ``snap_vars`` optionally FUSE vegetation-index and SNAP
    neural-net computation into the same Python pass (identical NumPy
    semantics as operators/indices.py and operators/biophys_op.py) — one
    Arrow round-trip instead of three for the flagship pipeline. The
    standalone operators remain the composable form.

    ``n_partitions`` sets the decode parallelism explicitly (default
    4 × defaultParallelism). This matters twice: (a) the document rows are
    media_ref *strings* — kilobytes per document — while the decode work
    per document is milliseconds of CPU, so AQE's byte-based partition
    coalescing would pack thousands of CPU-bound documents into a handful
    of tasks; an explicit repartition pins the parallelism (AQE honors
    user-specified partition counts). (b) on a real multi-file Iceberg
    table the scan provides natural parallelism and the repartition becomes
    a cheap rebalance of one-row-per-doc records.

    Plan shape (the scale-critical property): media refs, AOI geometry and
    scene metadata all live in the SAME document row, so the decode input
    is ONE narrow projection — array ``filter``/``transform`` over
    ``spans`` inside whole-stage codegen, no explode, no join, no groupBy.
    The only exchange is the round-robin repartition; the decode itself is
    a ``mapInPandas`` over one-row-per-document batches (Arrow transfers
    each geometry/metadata value once per document, not once per chunk).
    """
    bands = list(bands) if bands is not None else S2_BANDS_10_20 + ["SCL"]
    vi_vars = [v.lower() for v in vi_vars] if vi_vars else []
    snap_vars = list(snap_vars) if snap_vars else []
    from ..constants import BIOPHYS_COLUMN
    extra = vi_vars + [BIOPHYS_COLUMN[v] for v in snap_vars]

    schema = pixel_schema(bands)
    for c in extra:
        schema = schema.add(T.StructField(c, T.DoubleType()))

    prep = _maybe_repartition(decode_input(docs, bands), n_partitions)
    pixels = prep.mapInPandas(
        _make_batch_decoder(bands, gsd_override, vi_vars, snap_vars, extra),
        schema=schema)

    # NaN → NULL: keep relational no-data semantics (Spark treats NaN as a
    # groupable value and poisons avg; the reference's NaN maps to NULL here)
    for b in bands + extra:
        if b != "SCL":
            pixels = pixels.withColumn(
                b, F.when(~F.isnan(F.col(b)), F.col(b)))
    return pixels


def _maybe_repartition(prep: DataFrame, n_partitions: Optional[int]) -> DataFrame:
    """Guarantee CPU-saturating decode parallelism without forcing an
    exchange: if the scan already yields >= defaultParallelism partitions
    (the normal case for a real multi-file Iceberg table), the decode
    ``mapInPandas`` FUSES with the scan into one pipelined stage — the JVM
    side of the scan overlaps the Python decode and there is no barrier.
    Only a too-coarse input (few files) triggers a round-robin repartition,
    with an explicit count so AQE's byte-based coalescing cannot collapse
    the CPU-bound stage."""
    if n_partitions is not None:
        return prep.repartition(n_partitions)
    par = prep.sparkSession.sparkContext.defaultParallelism
    if prep.isStreaming:
        # probing the plan triggers batch planning (AnalysisException on a
        # streaming DataFrame); micro-batch size is governed by
        # maxFilesPerTrigger upstream, so a fixed round-robin fan-out is
        # the streaming-safe equivalent of the wave guard below
        return prep.repartition(4 * par)
    # require several task waves, not just one-per-core: documents are
    # heterogeneous (a 10 m-GSD AOI decodes ~4x slower than a 20 m one),
    # and a single wave runs at the speed of its slowest straggler.
    # The probe must be driver-side METADATA only: an .rdd probe on the
    # full plan would — under AQE — eagerly materialize every upstream
    # query stage (e.g. the survivor broadcast) once for the probe and
    # again for the real job. len(inputFiles) is a pure file-listing; with
    # the session's decode-tuned split sizing (files.maxPartitionBytes)
    # each file maps to >= 1 scan split, so it lower-bounds scan
    # parallelism. A non-file source (memory relation, tests) lists no
    # files and conservatively gets the explicit fan-out.
    try:
        n_files = len(prep.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= 3 * par:
        return prep
    return prep.repartition(4 * par)


def decode_input(docs: DataFrame, bands: List[str]) -> DataFrame:
    """The one-row-per-document decode input projection.

    Scale-measured design (each choice is ~an order of magnitude on this
    path):
    - ``spans.media_ref`` / ``spans.text`` nested-field extraction instead
      of higher-order ``filter``/``transform`` lambdas — codegen'd, and
      parquet nested-schema pruning then reads only those two sub-columns;
    - the arrays cross into Python as ONE ``concat_ws``-packed string per
      document, split Python-side (C-level) — transferring a 200-element
      Arrow list<string> per doc materializes 10^2 Python string objects
      per doc and is ~30x slower end-to-end;
    - for narrow band requests (the SCL-only QI pass) a ``contains``
      prefilter prunes refs before packing (chunk-pruning analog of
      projection pushdown); the Python side remains the authoritative
      band filter (exact segment match).
    """
    refs = F.col("spans.media_ref")
    if bands is not None and len(bands) <= _PREFILTER_MAX:
        pats = [f"/{b}/" for b in bands]
        refs = F.filter(refs, lambda r: _contains_any(r, pats))
    packed_refs = F.concat_ws(REF_SEP, refs)
    packed_texts = F.concat_ws(REF_SEP, F.col("spans.text"))
    return docs.select("doc_id", packed_refs.alias("media_refs"),
                       packed_texts.alias("texts"))


def _contains_any(col, pats: List[str]):
    out = col.contains(pats[0])
    for p in pats[1:]:
        out = out | col.contains(p)
    return out


_QI_META = ["aoi", "tileid", "assetid", "productid", "acquisition_time",
            "projection", "datasource", "processing"]


def qi_percentages(docs: DataFrame, qi_scale: float = 20.0,
                   n_partitions: Optional[int] = None) -> DataFrame:
    """Fused QI pass: decode SCL at the QI scale and emit ONE row per
    document — the scene metadata plus the 12 SCL class fractions (A1).
    This is the map-side pre-aggregation form of ``decode +
    class_percentages + quality_information``: output is
    document-cardinality, so the downstream QI filter/dedup/tile-mode plan
    shuffles kilobytes instead of the pixel table.

    Documents with zero inside-AOI pixels get NULL percentages (the
    reference's faulty-SCL NaN rows, aws.py:630-634)."""
    from ..constants import SCL_CLASSES
    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()),
         T.StructField("aoi", T.StringType()),
         T.StructField("tileid", T.StringType()),
         T.StructField("assetid", T.StringType()),
         T.StructField("productid", T.StringType()),
         T.StructField("acquisition_time", T.TimestampType()),
         T.StructField("projection", T.StringType()),
         T.StructField("datasource", T.StringType()),
         T.StructField("processing", T.StringType()),
         T.StructField("target_gsd", T.DoubleType())]
        + [T.StructField(c, T.DoubleType()) for c in SCL_CLASSES])
    n_cls = len(SCL_CLASSES)

    def qi_batches(batches):
        for pdf in batches:
            recs = pdf.to_dict("records")
            metas, pcts = [], []
            for raw in recs:
                meta = _parse_doc_texts(raw)
                gsd = float(qi_scale if qi_scale is not None
                            else meta["qi_scale"])
                scl = _decode_one(raw, ["SCL"], gsd, parsed=dict(meta))["SCL"]
                metas.append(meta)
                if len(scl):
                    pcts.append(np.bincount(scl, minlength=n_cls)[:n_cls]
                                / float(len(scl)))
                else:
                    pcts.append(np.full(n_cls, np.nan))
            res = {"doc_id": [m["doc_id"] for m in metas]}
            for c in _QI_META:
                res[c] = [m[c] for m in metas]
            res["target_gsd"] = [m["target_gsd"] for m in metas]
            arr = np.vstack(pcts) if pcts else np.zeros((0, n_cls))
            for i, c in enumerate(SCL_CLASSES):
                res[c] = arr[:, i]
            yield pd.DataFrame(res)

    prep = _maybe_repartition(decode_input(docs, ["SCL"]), n_partitions)
    qi = prep.mapInPandas(qi_batches, schema=schema)
    for c in SCL_CLASSES:
        qi = qi.withColumn(c, F.when(~F.isnan(F.col(c)), F.col(c)))
    return qi
