from sed_tpu.thresholds.optimizer import (
    Adam,
    HyperParamsOptimizer,
    AudioTaggingScoreCalculator,
    SoundEventDetectionScoreCalculator,
)
