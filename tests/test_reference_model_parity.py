"""Parity against the reference's OWN executable model code.

The sibling ``test_full_model_parity.py`` compares us to
``tools/torch_replica.py`` — a torch re-implementation WE wrote from the
same reading of the spec, so a shared misreading of ``gbm/model.py``
would pass both sides. These tests retire that gap: they import the
reference's actual modules from ``/root/reference`` (pure CPU torch once
``nn.DataParallel`` / ``.cuda()`` are monkeypatched to identity *before*
import), copy OUR weights across via ``utils.torch_interop``, and assert
output parity:

* ``nnBlocks.CrossEntropyWithProbs`` (reference: nnBlocks.py:47-138)
  vs ``ops.loss.smoothed_ce_loss`` — randomized logits/weights/labels,
  all three reductions;
* ``gbm/model.py::Attention`` (reference: gbm/model.py:114-264) full
  13-key eval-mode output dict vs ``apply_attention_mil`` at the FULL
  shipped architecture (ResNet-26 20/40/60/80, L=80/D=40/K=3);
* the vendored StyleGAN ``StyledGenerator``/``Discriminator``
  (reference: style-based-gan-pytorch-master-512/model.py:314-580) vs
  ``models.stylegan`` at full width, covering the plain-upsample blocks,
  the FusedUpsample/FusedDownsample+Blur blocks, fade-in blending,
  deterministic style mixing, and minibatch stddev.

Slow tier: imports and drives full-width reference modules on CPU.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    attention_mil as amil,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    stylegan as sg,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (
    loss as oloss,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
    gan as tgan,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.utils import (
    torch_interop as interop,
)

pytestmark = pytest.mark.slow

REF = "/root/reference"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")


class _IdentityDataParallel(nn.Module):
    """Stands in for nn.DataParallel: same ``.module`` child (so
    state_dict keys keep the ``cnn.module.`` prefix the reference's
    checkpoints carry) but runs the wrapped module in-process."""

    def __init__(self, module, device_ids=None, **kw):
        super().__init__()
        self.module = module

    def forward(self, *a, **kw):
        return self.module(*a, **kw)


class _cpu_reference_patches:
    """Make the CUDA-only reference modules importable + instantiable on
    CPU: ``.cuda()`` -> identity on Module and Tensor, ``DataParallel``
    -> in-process wrapper, and a stub for the missing ``PyTorchHelpers``
    module (``gbm/model.py:7`` star-imports it; SURVEY.md §2.4). The
    patches are restored on exit so other tests see stock torch."""

    def __enter__(self):
        self._orig = (nn.DataParallel, nn.Module.cuda, torch.Tensor.cuda,
                      sys.modules.get("PyTorchHelpers"))
        nn.DataParallel = _IdentityDataParallel
        nn.Module.cuda = lambda self, *a, **kw: self
        torch.Tensor.cuda = lambda self, *a, **kw: self
        sys.modules["PyTorchHelpers"] = types.ModuleType("PyTorchHelpers")
        sys.path.insert(0, REF)
        return self

    def __exit__(self, *exc):
        nn.DataParallel, nn.Module.cuda, torch.Tensor.cuda, helpers = \
            self._orig
        if helpers is None:
            sys.modules.pop("PyTorchHelpers", None)
        else:  # pragma: no cover - no prod PyTorchHelpers exists
            sys.modules["PyTorchHelpers"] = helpers
        sys.path.remove(REF)
        return False


def _load_ref_module(name, relpath):
    """Import a reference file by path (the reference tree has no
    packages); cached so the prints in Attention.reset_params run once."""
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# (a) loss: the reference's own CrossEntropyWithProbs
# ---------------------------------------------------------------------------


@needs_reference
@pytest.mark.parametrize("reduction", ["none", "mean", "sum"])
@pytest.mark.parametrize("weighted", [False, True])
def test_loss_matches_reference_nnblocks(reduction, weighted):
    with _cpu_reference_patches():
        nnb = _load_ref_module("ref_nnBlocks", "nnBlocks.py")
    rng = np.random.default_rng(17)
    for smoothing in (0.0, 0.25, 0.6):
        logits = rng.standard_normal((7, 3)).astype(np.float32) * 3
        labels = rng.integers(0, 3, size=7)
        weight = (rng.uniform(0.5, 2.0, size=3).astype(np.float32)
                  if weighted else None)
        ref_loss = nnb.CrossEntropyWithProbs(
            classes=3, smoothing=smoothing,
            weight=None if weight is None else torch.from_numpy(weight),
            reduction=reduction)(
                torch.from_numpy(logits), torch.from_numpy(labels))
        ours = oloss.smoothed_ce_loss(
            jnp.asarray(logits), jnp.asarray(labels), num_classes=3,
            smoothing=smoothing,
            weight=None if weight is None else jnp.asarray(weight),
            reduction=reduction)
        np.testing.assert_allclose(np.asarray(ours), ref_loss.numpy(),
                                   rtol=2e-6, atol=2e-6)


# ---------------------------------------------------------------------------
# (b) the reference's own gbm/model.py::Attention, full shipped config
# ---------------------------------------------------------------------------

CLASS_WEIGHTS = (0.8, 1.3, 0.9)


@pytest.fixture(scope="module")
def attention_pair():
    """(our params, our cfg, the REAL reference Attention with our
    weights loaded)."""
    cfg = amil.MILConfig(class_weights=CLASS_WEIGHTS)  # full shipped arch
    params = amil.init_attention_mil(jax.random.PRNGKey(3), cfg)
    with _cpu_reference_patches():
        ref_model_mod = _load_ref_module("ref_gbm_model", "gbm/model.py")
        net = ref_model_mod.Attention(
            n_classes=3, class_weights=torch.tensor(CLASS_WEIGHTS))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in interop.export_state_dict(params).items()}
    # strict: OUR export must cover the real model's EXACT key set
    net.load_state_dict(sd, strict=True)
    net.eval()
    return params, cfg, net


@needs_reference
def test_attention_13key_output_dict_matches_reference(attention_pair):
    params, cfg, net = attention_pair
    rng = np.random.default_rng(11)
    tiles = rng.standard_normal((24, 96, 96, 3)).astype(np.float32)
    label = 2

    ours = amil.apply_attention_mil(params, jnp.asarray(tiles), label, cfg,
                                    train=False)
    with torch.no_grad():
        ref = net(torch.from_numpy(tiles.transpose(0, 3, 1, 2)),
                  torch.tensor([label]))

    assert set(ref) == {"Aterm", "wROIs", "Bterm", "Mterm", "Fterm",
                        "Aterm_mu", "Aterm_var", "loss", "l2", "KLD",
                        "y_pred", "y_pred_hat", "error"}
    assert set(ref) <= set(ours)

    def _cmp(key, atol):
        got = np.asarray(ours[key], np.float32).reshape(-1)
        want = ref[key].detach().numpy().astype(np.float32).reshape(-1)
        assert got.shape == want.shape, key
        np.testing.assert_allclose(got, want, atol=atol, err_msg=key)

    # Fterm is 26 conv layers deep — f32 XLA-vs-torch accumulation noise
    _cmp("Fterm", 2e-3)
    for key in ("Aterm", "wROIs", "Bterm", "Mterm", "KLD",
                "Aterm_mu", "Aterm_var", "loss", "l2", "y_pred"):
        _cmp(key, 1e-4)
    assert int(ours["y_pred_hat"]) == int(ref["y_pred_hat"])
    assert float(ours["error"]) == float(ref["error"])
    # the BASELINE.md headline contract, against the real model
    assert float(np.abs(np.asarray(ours["y_pred"]) -
                        ref["y_pred"].numpy()).max()) < 1e-3


@needs_reference
def test_attention_prob_contract_across_bags(attention_pair):
    """1e-3 slide-probability contract holds across several bag sizes
    and labels against the real reference model."""
    params, cfg, net = attention_pair
    rng = np.random.default_rng(5)
    for t, label in ((3, 0), (40, 1), (65, 2)):
        tiles = (rng.standard_normal((t, 96, 96, 3)).astype(np.float32)
                 * 0.5)
        ours = amil.apply_attention_mil(params, jnp.asarray(tiles), label,
                                        cfg, train=False)
        with torch.no_grad():
            ref = net(torch.from_numpy(tiles.transpose(0, 3, 1, 2)),
                      torch.tensor([label]))
        assert float(np.abs(np.asarray(ours["y_pred"]) -
                            ref["y_pred"].numpy()).max()) < 1e-3


# ---------------------------------------------------------------------------
# (c) the vendored StyleGAN, full width, weights copied via interop
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vendored_gan(tmp_path_factory):
    """(our params_g, our params_d, real StyledGenerator, real
    Discriminator) at FULL width with our weights exported through the
    interop checkpoint converter — the same path a migrating user's
    checkpoints take."""
    pg = sg.init_styled_generator(jax.random.PRNGKey(7), width_mult=1.0)
    pd = sg.init_discriminator(jax.random.PRNGKey(8), width_mult=1.0,
                               from_rgb_activate=True)
    tmp = tmp_path_factory.mktemp("vendored_gan")
    ours = tmp / "gan.model"
    tgan.save_gan_checkpoint(str(ours), pg, pd, {}, {}, pg)
    back = tmp / "ref_gan.model"
    interop.export_gan_checkpoint(str(ours), str(back))
    sd = torch.load(str(back), map_location="cpu", weights_only=True)

    with _cpu_reference_patches():
        ref_sg = _load_ref_module(
            "ref_stylegan_model",
            "style-based-gan-pytorch-master-512/model.py")
        gen = ref_sg.StyledGenerator(512)
        disc = ref_sg.Discriminator(from_rgb_activate=True)
    gen.load_state_dict(sd["generator"], strict=True)
    disc.load_state_dict(sd["discriminator"], strict=True)
    gen.eval()
    disc.eval()
    return pg, pd, gen, disc


def _noise_lists(rng, batch, step):
    """(ours NHWC list, torch NCHW list) of the SAME noise planes."""
    ours, ref = [], []
    for i in range(step + 1):
        s = 4 * 2 ** i
        n = rng.standard_normal((batch, s, s, 1)).astype(np.float32)
        ours.append(jnp.asarray(n))
        ref.append(torch.from_numpy(n.transpose(0, 3, 1, 2)))
    return ours, ref


@needs_reference
@pytest.mark.parametrize("step,alpha", [(2, -1.0), (2, 0.3)])
def test_vendored_generator_parity_plain_blocks(vendored_gan, step, alpha):
    pg, _, gen, _ = vendored_gan
    rng = np.random.default_rng(23)
    z = rng.standard_normal((2, 512)).astype(np.float32)
    noise_o, noise_t = _noise_lists(rng, 2, step)

    ours = sg.apply_styled_generator(pg, jnp.asarray(z)[None], noise_o,
                                     step=step, alpha=alpha)
    with torch.no_grad():
        ref = gen(torch.from_numpy(z), noise=noise_t, step=step,
                  alpha=alpha)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4)


@needs_reference
def test_vendored_generator_parity_fused_upsample(vendored_gan):
    """step 5 = 128px: the FusedUpsample+Blur path (model.py:333-338)."""
    pg, _, gen, _ = vendored_gan
    rng = np.random.default_rng(29)
    z = rng.standard_normal((1, 512)).astype(np.float32)
    noise_o, noise_t = _noise_lists(rng, 1, 5)

    ours = sg.apply_styled_generator(pg, jnp.asarray(z)[None], noise_o,
                                     step=5, alpha=1.0)
    with torch.no_grad():
        ref = gen(torch.from_numpy(z), noise=noise_t, step=5, alpha=1.0)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=3e-4)


@needs_reference
def test_vendored_generator_style_mixing_parity(vendored_gan):
    """Deterministic mixing: the reference's mixing_range=(lo, hi) pins
    style[1] to blocks lo..hi (model.py:429-434); ours expresses the
    same schedule as a per-block style_sel vector."""
    pg, _, gen, _ = vendored_gan
    rng = np.random.default_rng(31)
    z = rng.standard_normal((2, 2, 512)).astype(np.float32)
    step, lo, hi = 3, 1, 2
    noise_o, noise_t = _noise_lists(rng, 2, step)
    sel = jnp.asarray([1 if lo <= i <= hi else 0 for i in range(9)],
                      jnp.int32)

    ours = sg.apply_styled_generator(pg, jnp.asarray(z), noise_o,
                                     step=step, alpha=1.0, style_sel=sel)
    with torch.no_grad():
        ref = gen([torch.from_numpy(z[0]), torch.from_numpy(z[1])],
                  noise=noise_t, step=step, alpha=1.0,
                  mixing_range=(lo, hi))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4)


@needs_reference
def test_vendored_generator_truncation_parity(vendored_gan):
    """mean_style truncation (generate.py's sampling path;
    model.py:491-501)."""
    pg, _, gen, _ = vendored_gan
    rng = np.random.default_rng(37)
    zm = rng.standard_normal((64, 512)).astype(np.float32)
    z = rng.standard_normal((2, 512)).astype(np.float32)
    noise_o, noise_t = _noise_lists(rng, 2, 2)

    ms_ours = sg.mean_style(pg, jnp.asarray(zm))
    with torch.no_grad():
        ms_ref = gen.mean_style(torch.from_numpy(zm))
    np.testing.assert_allclose(np.asarray(ms_ours), ms_ref.numpy(),
                               atol=1e-5)

    ours = sg.apply_styled_generator(
        pg, jnp.asarray(z)[None], noise_o, step=2, alpha=1.0,
        mean_style_w=ms_ours, style_weight=0.7)
    with torch.no_grad():
        ref = gen(torch.from_numpy(z), noise=noise_t, step=2, alpha=1.0,
                  mean_style=ms_ref, style_weight=0.7)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4)


@needs_reference
@pytest.mark.parametrize("step,alpha", [(2, -1.0), (2, 0.4), (4, 1.0)])
def test_vendored_discriminator_parity_plain_blocks(vendored_gan, step,
                                                    alpha):
    _, pd, _, disc = vendored_gan
    rng = np.random.default_rng(41)
    size = 4 * 2 ** step
    x = rng.standard_normal((3, size, size, 3)).astype(np.float32)

    ours = sg.apply_discriminator(pd, jnp.asarray(x), step=step,
                                  alpha=alpha, from_rgb_activate=True,
                                  train=False)
    with torch.no_grad():
        ref = disc(torch.from_numpy(x.transpose(0, 3, 1, 2)), step=step,
                   alpha=alpha)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


@needs_reference
def test_vendored_discriminator_parity_fused_downsample(vendored_gan):
    """step 5 = 128px input: the FusedDownsample+Blur blocks
    (model.py:510-515)."""
    _, pd, _, disc = vendored_gan
    rng = np.random.default_rng(43)
    x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)

    ours = sg.apply_discriminator(pd, jnp.asarray(x), step=5, alpha=0.5,
                                  from_rgb_activate=True, train=False)
    with torch.no_grad():
        ref = disc(torch.from_numpy(x.transpose(0, 3, 1, 2)), step=5,
                   alpha=0.5)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-4)
