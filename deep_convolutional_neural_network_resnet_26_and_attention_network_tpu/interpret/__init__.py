"""CNN interpretability toolkit — JAX rebuild of the reference's vendored
pytorch-cnn-visualizations suite (reference:
pytorch-cnn-visualizations-master/src/*, 12 techniques listed at
README.md:9-21). Forward hooks become explicit activation taps; backward
ReLU hooks become a custom-VJP activation.
"""

from . import gradcam, guided, misc, optimize, saliency  # noqa: F401
