"""Collective-communication invariants of the sharded programs.

SCALING.md's comm/compute model rests on three structural claims about
what GSPMD/shard_map actually emit; these tests pin them at compile time
(the HLO parse in tools/comm_audit.py) so a refactor that silently adds
collectives to a hot path fails CI, not a pod bill:

  1. the streaming tile-extract program is collective-FREE (the tile axis
     is embarrassingly parallel),
  2. pure data-parallel training syncs ~= exactly one parameter tree per
     step (the gradient all-reduce) and nothing param-sized beyond it,
  3. the explicit psum pool moves exactly its five tiny statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
    attention_mil as amil,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (  # noqa: E501
    mesh as M,
    shard_pool,
    steps,
)
from tools.comm_audit import parse_collectives, _tree_bytes

# the HLO-parser unit test below is device-free; only the mesh tests skip
needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")

CFG = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))


def _params():
    return amil.init_attention_mil(jax.random.PRNGKey(0), CFG)


@needs_mesh
def test_streaming_extract_is_collective_free():
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (  # noqa: E501
        transforms,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
        resnet,
    )

    mesh = M.make_mesh(8)
    params = _params()
    cnn = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, M.replicated(mesh)), params["cnn"])
    chunk = jax.device_put(jnp.ones((64, 32, 32, 3), jnp.uint8),
                           M.tile_stream_sharding(mesh))

    def extract(p, raw):
        t = transforms.eval_transform(raw, resolution=32)
        return resnet.apply_resnet26(
            p, t, compute_dtype=jnp.bfloat16).astype(jnp.float32)

    txt = jax.jit(extract).lower(cnn, chunk).compile().as_text()
    assert parse_collectives(txt) == {}, (
        "the per-tile extract path must stay embarrassingly parallel")


@needs_mesh
@pytest.mark.slow  # fwd+bwd+Adam compile is ~2 min on the 1-CPU host
def test_dp_train_step_syncs_one_param_tree():
    mesh = M.make_mesh(8, slides=8)
    params = _params()
    param_bytes = _tree_bytes(params)
    state = steps.replicate_state(mesh, steps.init_train_state(params))
    sh = steps.shard_batch(mesh, jnp.ones((8, 8, 32, 32, 3), jnp.float32),
                           jnp.ones((8, 8), jnp.float32),
                           jnp.zeros((8,), jnp.int32))
    step = steps.make_train_step(CFG, compute_dtype=jnp.bfloat16,
                                 donate=False)
    with mesh:
        txt = step.lower(state, *sh, jnp.float32(1e-4),
                         jax.random.PRNGKey(1)).compile().as_text()
    stats = parse_collectives(txt)
    total = sum(v["payload_bytes"] for v in stats.values())
    # one f32 gradient tree + small psum'd metrics/all-gathers; anything
    # >=10% beyond the tree means a replicated tensor started syncing
    assert param_bytes <= total <= 1.1 * param_bytes, (stats, param_bytes)
    ar = stats.get("all-reduce", {"payload_bytes": 0})
    assert ar["payload_bytes"] >= param_bytes


@needs_mesh
def test_explicit_pool_moves_exactly_its_statistics():
    mesh = M.make_mesh(8, slides=1)
    params = _params()
    T = 32 * 8
    H = jnp.ones((T, CFG.L), jnp.float32)
    Hs, ms = shard_pool.shard_features(mesh, H, jnp.ones((T,), jnp.float32))
    pool = shard_pool.make_sharded_pool(CFG, mesh)
    txt = pool.lower(params, Hs, ms).compile().as_text()
    stats = parse_collectives(txt)
    assert set(stats) <= {"all-reduce"}, stats
    predicted = 4 * (1 + 2 * CFG.L + CFG.K + CFG.K * CFG.O)
    got = stats["all-reduce"]["payload_bytes"]
    assert got == predicted, (stats, predicted)
    # count, mean, var, L1-denom, A^T B — XLA may tuple-combine the two
    # independent leading sums, so 4 or 5 programs-worth is structural
    assert 3 <= stats["all-reduce"]["count"] <= 5


def test_parse_collectives_shapes():
    txt = """
  %ar = f32[100]{0} all-reduce(f32[100]{0} %x), replica_groups={}
  %t = (f32[10]{0}, bf16[4,4]{1,0}) all-reduce-start(f32[10]{0} %a, bf16[4,4]{1,0} %b)
  %d = f32[10]{0} all-reduce-done(%t)
  %ag = u8[64]{0} all-gather(u8[8]{0} %y), dimensions={0}
"""
    stats = parse_collectives(txt)
    assert stats["all-reduce"]["count"] == 2
    assert stats["all-reduce"]["payload_bytes"] == 400 + (40 + 32)
    assert stats["all-gather"] == {"count": 1, "payload_bytes": 64}
