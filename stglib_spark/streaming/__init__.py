"""Structured Streaming analogues of the reference's batch semantics
(SURVEY §2.13). The reference is pure batch; these expose its windowing /
dedup / gap semantics on an unbounded stream so the same engine serves the
`events`-style live feed:

- ``wave_interval`` / ``average_interval`` bursting (waves.py:2037-2091)
  ≡ tumbling windows with watermark;
- duplicate timestamps (sig/cdf2nc.py:1582 drop_duplicates) ≡
  ``dropDuplicatesWithinWatermark``;
- burst NaN-fill tolerance (waves.py:1992-2034) ≡ allowed lateness.
"""

from stglib_spark.streaming.bursts import (
    export_nc_batch_writer,
    read_events_stream,
    streaming_burst_average,
    streaming_tide_average,
    bloom_gate_verdicts,
    streaming_bloom_gate,
    streaming_cms_counts,
    streaming_hll_distinct,
    streaming_content_dedup,
    streaming_decontaminate,
    streaming_dedup,
    streaming_diff_gate,
    streaming_gap_fill,
    streaming_hist_percentiles,
    streaming_kmv_distinct,
    streaming_near_dedup,
    streaming_pack_sequences,
    streaming_phash_gate,
    streaming_winnow_gate,
    streaming_puv,
    streaming_qaqc_audit,
    streaming_qaqc_lookahead_audit,
    streaming_quality_class_counts,
    streaming_sessionize,
    streaming_topk_cosine,
    streaming_wave_stats,
)

__all__ = [
    "export_nc_batch_writer",
    "read_events_stream",
    "streaming_burst_average",
    "streaming_tide_average",
    "bloom_gate_verdicts",
    "streaming_bloom_gate",
    "streaming_cms_counts",
    "streaming_hll_distinct",
    "streaming_content_dedup",
    "streaming_decontaminate",
    "streaming_dedup",
    "streaming_diff_gate",
    "streaming_gap_fill",
    "streaming_hist_percentiles",
    "streaming_kmv_distinct",
    "streaming_near_dedup",
    "streaming_pack_sequences",
    "streaming_phash_gate",
    "streaming_winnow_gate",
    "streaming_puv",
    "streaming_qaqc_audit",
    "streaming_qaqc_lookahead_audit",
    "streaming_quality_class_counts",
    "streaming_sessionize",
    "streaming_topk_cosine",
    "streaming_wave_stats",
]
