from sed_tpu.models.registry import get_model, MODEL_REGISTRY
