"""Model families: the ResNet-26 tile extractor and gated attention-MIL
head (flagship), plus the auxiliary capability surface (StyleGAN, WAE,
LatentUNet, nnBlocks toolbox, torchvision-template ResNet, discriminator
feature extraction)."""

from . import alt_resnet  # noqa: F401
from . import attention_mil  # noqa: F401
from . import blocks  # noqa: F401
from . import disc_extractor  # noqa: F401
from . import resnet  # noqa: F401
from . import stylegan  # noqa: F401
from . import unet  # noqa: F401
from . import wae  # noqa: F401
