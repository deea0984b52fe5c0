from divergence_tpu.utils.summary import RunSummary, StageTimer

__all__ = ["RunSummary", "StageTimer"]
