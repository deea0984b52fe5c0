from divergence_tpu.io.gtrack import (
    PopulationTrack,
    read_gtrack_points,
    write_score_track,
    write_segments_track,
    read_score_track,
)
from divergence_tpu.io.vcf import vcf_to_gtrack, GENOTYPE_CODES

__all__ = [
    "PopulationTrack",
    "read_gtrack_points",
    "write_score_track",
    "write_segments_track",
    "read_score_track",
    "vcf_to_gtrack",
    "GENOTYPE_CODES",
]
