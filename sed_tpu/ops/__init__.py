from sed_tpu.ops.logmel_kernel import fused_logmel
