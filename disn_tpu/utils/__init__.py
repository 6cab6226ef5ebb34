from disn_tpu.utils.logging import MetricLogger, Timer  # noqa: F401
from disn_tpu.utils import output as output_utils  # noqa: F401
