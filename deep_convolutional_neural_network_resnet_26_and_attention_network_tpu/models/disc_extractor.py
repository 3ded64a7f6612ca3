"""StyleGAN-discriminator feature extraction ("partial GAN trained
discriminator reduction").

The reference's legacy pipeline reused a histology-GAN discriminator,
truncated at ``disc_cutoff = 6``, as the transfer-learned tile feature
extractor for the classifier (reference: gbm/classify.py:33,37,116 —
``classifier(x, y, step_input=disc_cutoff)``). This module provides that
capability against our StyleGAN discriminator: run tiles through from_rgb
and the progression blocks from a given resolution step down to a cutoff,
then global-average-pool into an embedding that plugs into the
attention-MIL head via ``apply_attention_mil(extractor=...)``.
"""

import jax.numpy as jnp

from . import stylegan as sg

DISC_CUTOFF = 6  # reference: gbm/classify.py:33


def feature_dim(step: int, *, cutoff: int = DISC_CUTOFF,
                width_mult: float = 1.0) -> int:
    """Output channel width: the cout of the last block the truncated
    reduction executes (i = step down to step-cutoff+1)."""
    layout, _ = sg._disc_layout(width_mult)
    n_layer = len(layout)
    last_i = max(step - cutoff, -1) + 1
    return layout[n_layer - last_i - 1][1]


def apply_disc_extractor(params, tiles, *, step: int,
                         cutoff: int = DISC_CUTOFF, width_mult: float = 1.0,
                         from_rgb_activate: bool = True):
    """tiles [T, s, s, 3] at resolution 4*2^step -> features [T, C].

    Runs from_rgb at ``step`` then progression blocks while ``i > step -
    cutoff`` — i.e. ``cutoff`` discriminator blocks — mirroring the legacy
    ``step_input`` truncation, and mean-pools the spatial map.
    """
    layout, _ = sg._disc_layout(width_mult)
    n_layer = len(layout)
    if not 0 <= step < n_layer:
        raise ValueError(
            f"step {step} out of range for a {n_layer}-block discriminator "
            f"(max resolution {4 * 2 ** (n_layer - 1)}px)")
    if cutoff < 1:
        raise ValueError(f"cutoff must be >= 1 (got {cutoff}): at least "
                         "one discriminator block must run")
    out = None
    stop_at = step - cutoff
    for i in range(step, max(stop_at, -1), -1):
        index = n_layer - i - 1
        spec = layout[index]
        if i == step:
            out = sg.equal_conv2d(tiles, params["from_rgb"][index]["w"],
                                  params["from_rgb"][index]["b"])
            if from_rgb_activate:
                out = sg.lrelu(out)
        if i == 0:
            out = sg.minibatch_stddev(out)
        out = sg._disc_conv_block(params["progression"][index], out, spec,
                                  train=False)
    return jnp.mean(out, axis=(1, 2))  # [T, C]


def make_extractor(disc_params, *, step: int, cutoff: int = DISC_CUTOFF,
                   width_mult: float = 1.0, from_rgb_activate: bool = True):
    """Returns extractor(params_unused, tiles) -> [T, C] for
    apply_attention_mil(extractor=...). The discriminator weights are
    closed over (frozen transfer), like the reference's pretrained
    discriminator (gbm/classify.py:37)."""

    def extract(_params, tiles, **_kw):
        return apply_disc_extractor(disc_params, tiles, step=step,
                                    cutoff=cutoff, width_mult=width_mult,
                                    from_rgb_activate=from_rgb_activate)

    return extract
