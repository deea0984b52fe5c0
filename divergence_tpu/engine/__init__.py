from divergence_tpu.engine.fet_engine import run_fet
from divergence_tpu.engine.css_engine import run_css

__all__ = ["run_fet", "run_css"]
