from sed_tpu.utils.paths import Workspace
from sed_tpu.utils.statistics import StatisticsContainer
from sed_tpu.utils.logging_utils import create_logging, get_filename
