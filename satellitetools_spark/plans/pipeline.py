"""End-to-end query plans — the engine's ``wrappers.get_s2_qi_and_data``.

Reference lifecycle (wrappers.py:28-78) re-expressed as one lazy Catalyst
plan with the reference's hand-rolled optimization kept explicit: the
*cheap-column-first two-phase scan* (aws.py:306-360) — decode only the SCL
band at QI scale, filter scenes on cloud statistics, and decode the full
band set only for survivors. Within each phase, band pruning happens on the
media_ref string before any shuffle, so the expensive full decode touches
only passing documents.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import S2_BANDS_10_20
from ..operators.biophys_op import run_snap_all
from ..operators.indices import compute_vegetation_index
from ..operators.quality import filter_docs_by_quality, quality_information
from ..operators.timeseries import dataset_to_timeseries
from ..sources.decode import decode_documents
from ..sources.docs import doc_dimension


def get_s2_qi_and_data(
    docs: DataFrame,
    bands: Optional[Iterable[str]] = None,
    qi_threshold: float = 0.02,
    qi_filter: Optional[List[str]] = None,
    qi_scale: float = 20.0,
) -> Tuple[DataFrame, DataFrame]:
    """QI table + filtered long pixel table (reference wrappers.py:28-78)."""
    bands = list(bands) if bands is not None else S2_BANDS_10_20 + ["SCL"]
    dim = doc_dimension(docs)

    # Phase 1 — quality scan: SCL only, at the QI evaluation scale
    scl20 = decode_documents(docs, ["SCL"], gsd_override=qi_scale, dim=dim)
    qi = quality_information(scl20, dim)

    # Phase 2 — filter scenes, then full decode of survivors only
    survivors = filter_docs_by_quality(dim, qi, qi_threshold, qi_filter)
    docs_f = docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
    pixels = decode_documents(docs_f, bands, dim=survivors)
    return qi, pixels


def flagship_timeseries(
    docs: DataFrame,
    variables: Iterable[str] = ("ndvi", "lai"),
    qi_threshold: float = 0.02,
) -> DataFrame:
    """The repo's core query: 'cloud-filtered per-date biophysical/VI
    timeseries for every AOI' — QI filter → decode → NDVI + SNAP LAI →
    per-date stats with uncertainty + 95% CI."""
    _qi, pixels = get_s2_qi_and_data(docs, qi_threshold=qi_threshold)
    variables = list(variables)
    vi_vars = [v for v in variables if v in ("ndvi", "ci_red_edge", "gcc")]
    snap_vars = [v for v in variables if v not in vi_vars]
    for v in vi_vars:
        pixels = compute_vegetation_index(pixels, v)
    if snap_vars:
        name_map = {"lai": "LAI", "fapar": "FAPAR", "fcover": "FCOVER",
                    "lai_cab": "LAI_Cab", "lai_cw": "LAI_Cw"}
        pixels = run_snap_all(pixels, [name_map[v] for v in snap_vars])
    ts = dataset_to_timeseries(
        pixels, variables, add_uncertainty=True,
        add_confidence_intervals=True, confidence_level="95")
    return ts.orderBy("aoi", "time")
