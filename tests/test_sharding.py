"""Sharded execution tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnad_tpu.config import NetConfig, RNaDConfig
from rnad_tpu.learn import rnad as rnad_lib
from rnad_tpu.models import nets
from rnad_tpu.parallel import mesh as mesh_lib, runtime


requires_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


@requires_multidevice
def test_mesh_shapes():
    m = mesh_lib.make_mesh()
    assert m.shape[mesh_lib.DATA_AXIS] == 8
    m2 = mesh_lib.make_mesh(model_parallelism=2)
    assert m2.shape[mesh_lib.DATA_AXIS] == 4
    assert m2.shape[mesh_lib.MODEL_AXIS] == 2


@requires_multidevice
def test_sharded_train_step_runs_and_shards(small_tree):
    cfg = RNaDConfig(batch_size=128, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    (train_step, rollout_jit, _, _), mesh, place_state = \
        runtime.make_sharded_rnad_fns(net, small_tree, cfg)
    state = place_state(
        rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg))
    state, traj = rollout_jit(state)
    # the trajectory batch axis must actually be sharded over 8 devices
    sh = traj.indices.sharding
    assert len(sh.device_set) == 8
    state, metrics = train_step(state, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))
    # parameters remain replicated after the update (gradient psum happened)
    kern = state.variables["params"]["policy_fc1"]["kernel"]
    assert kern.sharding.is_fully_replicated


@requires_multidevice
def test_sharded_matches_single_device(small_tree):
    """Same seed, same step: sharded and unsharded runs must agree (GSPMD
    must not change the math)."""
    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))

    plain_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state_a = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    state_a, metrics_a = plain_step(state_a, jnp.float32(0.5))

    (shard_step, _, _, _), mesh, place_state = \
        runtime.make_sharded_rnad_fns(net, small_tree, cfg)
    state_b = place_state(
        rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg))
    state_b, metrics_b = shard_step(state_b, jnp.float32(0.5))

    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-4)
    ka = np.asarray(state_a.variables["params"]["policy_fc1"]["kernel"])
    kb = np.asarray(state_b.variables["params"]["policy_fc1"]["kernel"])
    np.testing.assert_allclose(ka, kb, atol=1e-5)


@requires_multidevice
def test_model_parallel_mlp(small_tree):
    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=64))
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    (train_step, _, _, _), mesh, place_state = runtime.make_sharded_rnad_fns(
        net, small_tree, cfg, mesh=mesh, model_parallel_mlp=True)
    state = place_state(
        rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg))
    kern = state.variables["params"]["policy_fc0"]["kernel"]
    assert not kern.sharding.is_fully_replicated  # width is model-sharded
    state, metrics = train_step(state, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))


@requires_multidevice
def test_trainer_class_sharded_end_to_end(tmp_path, small_tree):
    """Full RNaD trainer driving the sharded step family on the mesh."""
    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    ncfg = NetConfig(type="MLP", max_actions=3, width=32)
    trainer = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="sharded",
                            runs_root=str(tmp_path), seed=0)
    (trainer.train_step, trainer.rollout_jit, trainer.learn_jit,
     trainer.nashconv_fn), mesh, place = runtime.make_sharded_rnad_fns(
        trainer.net, small_tree, cfg)
    trainer.initialize()
    trainer.state = place(trainer.state)
    trainer.run(checkpoint_mod=1, expl_mod=1, log_mod=1)
    assert int(trainer.state.total_steps) == 2
    assert np.isfinite(trainer.nashconv())
    # checkpoint of the sharded state must be reloadable
    assert trainer.store.latest() is not None


@requires_multidevice
def test_shard_map_explicit_collectives(small_tree):
    """Explicit shard_map + psum data-parallel step: runs, stays finite, and
    parameters remain identical across devices after the update."""
    from rnad_tpu.parallel import shard_map_step

    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    mesh = mesh_lib.make_mesh()
    step = shard_map_step.make_shard_map_train_step(net, small_tree, cfg,
                                                    mesh)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    state, metrics = step(state, 0.5)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = step(state, 1.0)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.total_steps) == 2
    kern = state.variables["params"]["policy_fc1"]["kernel"]
    assert np.isfinite(np.asarray(kern)).all()
