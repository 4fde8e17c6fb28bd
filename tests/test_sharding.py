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
def test_model_parallel_deep_mlp(small_tree):
    """depth>1 MLP under TP: alternating Megatron layout on the hidden
    kernels (parallel/mesh.py::mlp_param_spec), step stays finite."""
    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=64,
                                   depth=3))
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    (train_step, _, _, _), mesh, place_state = runtime.make_sharded_rnad_fns(
        net, small_tree, cfg, mesh=mesh, model_parallel_mlp=True)
    state = place_state(
        rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg))
    h1 = state.variables["params"]["policy_hidden1"]["kernel"]
    h2 = state.variables["params"]["policy_hidden2"]["kernel"]
    assert not h1.sharding.is_fully_replicated
    assert not h2.sharding.is_fully_replicated
    state, metrics = train_step(state, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))


@requires_multidevice
def test_model_parallel_convnet(small_tree):
    """ConvNet under TP: channels sharded over the model axis
    (parallel/mesh.py::conv_param_spec), step stays finite."""
    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="ConvNet", max_actions=3,
                                   channels=16, depth=1, batch_norm=True))
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    (train_step, _, _, _), mesh, place_state = runtime.make_sharded_rnad_fns(
        net, small_tree, cfg, mesh=mesh, model_parallel_mlp=True)
    state = place_state(
        rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg))
    kern = state.variables["params"]["pre"]["row_conv"]["kernel"]
    assert not kern.sharding.is_fully_replicated  # cout is model-sharded
    head = state.variables["params"]["policy"]["kernel"]
    assert head.sharding.is_fully_replicated
    state, metrics = train_step(state, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))


@requires_multidevice
def test_model_parallel_equinet(small_tree):
    """EquiNet under TP: exchangeable-layer channels sharded over the model
    axis (parallel/mesh.py::equinet_param_spec), step stays finite."""
    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="EquiNet", max_actions=3,
                                   channels=16, depth=2))
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    (train_step, _, _, _), mesh, place_state = runtime.make_sharded_rnad_fns(
        net, small_tree, cfg, mesh=mesh, model_parallel_mlp=True)
    state = place_state(
        rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg))
    kern = state.variables["params"]["ex0"]["kernel"]
    assert not kern.sharding.is_fully_replicated  # C out is model-sharded
    head = state.variables["params"]["policy"]["kernel"]
    assert head.sharding.is_fully_replicated
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
def test_shard_map_learn_matches_single_device(small_tree):
    """The shard_map learner update on a FIXED trajectory must equal the
    unsharded learn_fn up to reduction order: loss normalizations psum
    numerators and valid counts globally, and gradients psum across shards
    (the claim in parallel/shard_map_step.py's docstring)."""
    from rnad_tpu.parallel import shard_map_step

    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    _, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(net, small_tree,
                                                          cfg)
    state0 = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    _, traj = rollout_jit(state0)

    state_a, metrics_a = learn_jit(state0, traj, jnp.float32(0.5))

    mesh = mesh_lib.make_mesh()
    learn_sm = shard_map_step.make_shard_map_learn_step(net, small_tree,
                                                        cfg, mesh)
    state_b, metrics_b = learn_sm(state0, traj, 0.5)

    for k in metrics_a:
        np.testing.assert_allclose(
            float(metrics_a[k]), float(metrics_b[k]), rtol=2e-5, atol=1e-6,
            err_msg=f"metric {k} diverges between shard_map and unsharded")
    flat_a = jax.tree.leaves(state_a.variables["params"])
    flat_b = jax.tree.leaves(state_b.variables["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@requires_multidevice
def test_shard_map_convnet_bn_stats_combined(small_tree):
    """ConvNet+BN under shard_map: batch normalization is per-shard
    (non-sync BN), but the running-stat EMAs must be pmean-combined so all
    devices carry identical variables — the merged stats must equal the
    mean over lane slices of the unsharded learn_loss's mutated stats."""
    from rnad_tpu.ops import stepping
    from rnad_tpu.parallel import shard_map_step

    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="ConvNet", max_actions=3,
                                   channels=8, depth=1, batch_norm=True))
    _, rollout_jit, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state0 = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    _, traj = rollout_jit(state0)

    mesh = mesh_lib.make_mesh()
    learn_sm = shard_map_step.make_shard_map_learn_step(net, small_tree,
                                                        cfg, mesh)
    state_b, metrics_b = learn_sm(state0, traj, 0.5)
    assert np.isfinite(float(metrics_b["loss"]))

    # BN statistics are purely local to a shard, so each shard's mutated
    # collection equals the unsharded learn_loss run on its lane slice.
    packed = stepping.make_packed_tables(small_tree)
    aux = {k: v for k, v in state0.variables.items() if k != "params"}
    n = mesh.shape[mesh_lib.DATA_AXIS]
    per = traj.indices.shape[1] // n
    slices = []
    for i in range(n):
        sl = jax.tree.map(lambda x: x[:, i * per:(i + 1) * per], traj)
        _, (mutated, _) = rnad_lib.learn_loss(
            state0.variables["params"], aux, net, state0.variables_target,
            state0.variables_reg, state0.variables_reg_, packed, sl,
            jnp.float32(0.5), cfg)
        slices.append(mutated["batch_stats"])
    expected = jax.tree.map(
        lambda *xs: np.mean([np.asarray(x) for x in xs], axis=0), *slices)
    got = state_b.variables["batch_stats"]
    jax.tree.map(lambda e, g: np.testing.assert_allclose(
        e, np.asarray(g), rtol=1e-5, atol=1e-7), expected, got)


@requires_multidevice
def test_gspmd_mesh_size_invariance(small_tree):
    """Same seed, data-axis sizes {1, 2, 4, 8}: the GSPMD path must roll out
    bit-identical trajectories (partitionable threefry: lane randomness is a
    pure function of key and global position) and produce matching train
    metrics — the determinism claim of parallel/runtime.py."""
    cfg = RNaDConfig(batch_size=64, eta=0.2, bounds=(1,), delta_m=(2,),
                     lr=1e-3, gamma_averaging=0.01, logit_clip=2.0)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))

    ref_traj = None
    ref_metrics = None
    for k in (1, 2, 4, 8):
        mesh = mesh_lib.make_mesh(jax.devices()[:k])
        (train_step, rollout_jit, _, _), mesh, place_state = \
            runtime.make_sharded_rnad_fns(net, small_tree, cfg, mesh=mesh)
        state = place_state(
            rnad_lib.init_train_state(net, jax.random.PRNGKey(7), 3, cfg))
        _, traj = rollout_jit(state)
        state, metrics = train_step(state, jnp.float32(0.5))
        if ref_traj is None:
            ref_traj, ref_metrics = traj, metrics
            continue
        for field in ("indices", "actions", "rewards"):
            np.testing.assert_array_equal(
                np.asarray(getattr(traj, field)),
                np.asarray(getattr(ref_traj, field)),
                err_msg=f"{field} differs between mesh sizes 1 and {k}")
        # the behavior policy is a softmax whose reduction order depends on
        # the compiled partitioning: equal to float tolerance, not bitwise
        np.testing.assert_allclose(
            np.asarray(traj.policy), np.asarray(ref_traj.policy),
            rtol=1e-6, atol=1e-7,
            err_msg=f"policy differs between mesh sizes 1 and {k}")
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(ref_metrics["loss"]), rtol=1e-5)


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


def test_nashconv_sharded_matches_single_device(small_tree):
    """Mesh-sharded backward induction (metrics/nashconv_shard.py) ==
    the single-device pass, node axis over the 8-virtual-device data axis:
    per-node best-response values for a net policy, and NashConv 0 for the
    stored exact solution."""
    from rnad_tpu.metrics import nashconv as nc
    from rnad_tpu.metrics import nashconv_shard

    mesh = mesh_lib.make_mesh()
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    variables = nets.init_variables(net, jax.random.PRNGKey(2), 3)
    apply_fn = lambda v, obs: nets.apply_eval(net, v, obs)
    joint = nc.joint_policy_all_nodes(small_tree, apply_fn, variables)

    ref = nc.nashconv_root(small_tree, joint)
    got = nashconv_shard.nashconv_sharded(small_tree, joint, mesh)
    np.testing.assert_allclose(np.asarray(got.row_best),
                               np.asarray(ref.row_best), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.col_best),
                               np.asarray(ref.col_best), rtol=1e-6,
                               atol=1e-6)

    sol = nashconv_shard.nashconv_sharded(small_tree, small_tree.solution,
                                          mesh)
    assert abs(float(sol.nashconv())) < 1e-5


def test_nashconv_sharded_large_tree():
    """The sharded induction at production node count: NashConv 0 for the
    785k-node tree's stored exact solution (the pad-node guard is
    exercised by the 125-node test above, 125 % 8 != 0)."""
    from rnad_tpu.config import ShapingRule, TreeConfig
    from rnad_tpu.env import tree as tree_lib
    from rnad_tpu.metrics import nashconv as nc
    from rnad_tpu.metrics import nashconv_shard

    cfg_tree = TreeConfig(
        max_actions=5, max_transitions=2, transition_threshold=0.25,
        depth_bound=6,
        depth_bound_rule=ShapingRule(delta=-1, stochastic_delta=-2,
                                     stochastic_prob=0.55))
    try:
        tree = tree_lib.generate_tree_native(cfg_tree, seed=0)
    except RuntimeError:
        tree = tree_lib.generate_tree(cfg_tree, seed=0)

    mesh = mesh_lib.make_mesh()
    got = nashconv_shard.nashconv_sharded(tree, tree.solution, mesh)
    assert abs(float(got.nashconv())) < 1e-4


def test_trainer_hook_sharded_nashconv(small_tree):
    """make_sharded_rnad_fns' NashConv hook takes the node-sharded
    induction above the chunk threshold and matches the unsharded eval."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    cfg = RNaDConfig(batch_size=64, nashconv_chunk_nodes=16)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    *_, nc_plain = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    (_, _, _, nc_sharded), mesh, _ = runtime.make_sharded_rnad_fns(
        net, small_tree, cfg)
    a = float(nc_plain(state.variables).nashconv())
    b = float(nc_sharded(state.variables).nashconv())
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)
