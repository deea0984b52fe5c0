from divergence_tpu.core.windows import WindowPlan, plan_windows
from divergence_tpu.core.batching import Bucket, bucketize

__all__ = ["WindowPlan", "plan_windows", "Bucket", "bucketize"]
