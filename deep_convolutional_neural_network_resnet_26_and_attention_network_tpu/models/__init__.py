"""Model families: ResNet-26 feature extractor, gated attention-MIL head."""

from . import resnet  # noqa: F401
from . import attention_mil  # noqa: F401
