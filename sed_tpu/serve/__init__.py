from sed_tpu.serve.engine import SedInferenceEngine, window_starts
