"""Observability: statistics, reporting, per-stage profiling, logging.

Reference analog: onmt/utils/statistics.py, report_manager.py,
logging.py (SURVEY.md §2.1, §5.1/§5.5).
"""

from nanodecoder_tpu.utils.statistics import Statistics, ThroughputMeter  # noqa: F401
from nanodecoder_tpu.utils.report import ReportManager  # noqa: F401
from nanodecoder_tpu.utils.profiling import StageTimer  # noqa: F401
from nanodecoder_tpu.utils.logging import get_logger  # noqa: F401
