from vmrframe_tpu.ops.masking import mask_logits, length_to_mask, attention_mask_2d
from vmrframe_tpu.ops.span import infer_span_1d, infer_span_2d
