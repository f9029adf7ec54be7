from sed_tpu.eval.segment_metrics import (
    SegmentBasedMetrics,
    official_evaluate,
    load_event_list_csv,
)
from sed_tpu.eval.ap import (
    sed_average_precision,
    clipwise_average_precision,
)
