from infgen_tpu.tokenizers.attr_tokenizer import AttrTokenizer  # noqa: F401
from infgen_tpu.tokenizers.motion_tokenizer import MotionTokenizer  # noqa: F401
