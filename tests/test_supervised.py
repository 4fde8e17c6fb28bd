"""Supervised oracle-distillation baseline: the distilled policy's NashConv
must approach the architecture's floor (far below uniform play)."""

import jax
import numpy as np

from rnad_tpu.config import NetConfig
from rnad_tpu.learn import supervised
from rnad_tpu.metrics import nashconv as nc
from rnad_tpu.models import nets


def test_oracle_distillation_beats_uniform(small_tree):
    t = small_tree
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=128))
    variables, metrics = supervised.train_oracle_net(
        t, net, jax.random.PRNGKey(0), steps=1500, lr=3e-3)
    assert np.isfinite(metrics["final_loss"])

    import jax.numpy as jnp
    lr_mask = t.legal[:, 0, :, 0]
    lc_mask = t.legal[:, 0, 0, :]
    uni = jnp.concatenate(
        [lr_mask / jnp.maximum(lr_mask.sum(-1, keepdims=True), 1.0),
         lc_mask / jnp.maximum(lc_mask.sum(-1, keepdims=True), 1.0)], -1)
    uniform_nc = float(nc.nashconv(t, uni).nashconv())
    # distillation with perfect labels should land far below uniform play
    assert metrics["nashconv"] < uniform_nc * 0.35
