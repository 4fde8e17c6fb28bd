"""Trainer tests: step mechanics, EMA/rotation semantics, checkpoint/resume
byte-for-byte state recovery, and the buffered (off-policy) path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnad_tpu.config import NetConfig, RNaDConfig
from rnad_tpu.learn import rnad as rnad_lib
from rnad_tpu.models import nets


def small_cfg(**kw):
    base = dict(batch_size=64, eta=0.2, bounds=(2,), delta_m=(4,), lr=1e-3,
                gamma_averaging=0.01, logit_clip=2.0)
    base.update(kw)
    return RNaDConfig(**base)


def test_train_step_metrics_finite(small_tree):
    cfg = small_cfg()
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=32))
    train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    state, metrics = train_step(state, jnp.float32(0.5))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.total_steps) == 1


def test_rows_actor_train_step_equivalent(small_tree):
    """The training rollout's seat-fused rows-actor (rollout_rows_actor,
    on by default for the depth-1 f32 MLP) must roll the same episodes and
    produce the same update as the generic actor path — equal up to matmul
    reduction order on the actor logits (ties in sampling are measure-zero;
    on CPU's sequential dots the logits match closely enough that the
    sampled episodes coincide)."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    states = []
    for mode in ("off", "on"):
        cfg = small_cfg(batch_size=48, rollout_rows_actor=mode)
        train_step, rollout_jit, _, _ = rnad_lib.make_rnad_fns(
            net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(7), 3, cfg)
        _, traj = rollout_jit(state)
        state, _ = train_step(state, jnp.float32(0.5))
        states.append((state, traj))
    np.testing.assert_array_equal(np.asarray(states[0][1].indices),
                                  np.asarray(states[1][1].indices))
    np.testing.assert_array_equal(np.asarray(states[0][1].actions),
                                  np.asarray(states[1][1].actions))
    close = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b),
                                 rtol=2e-6, atol=1e-7),
        states[0][0].variables, states[1][0].variables)
    assert jax.tree.all(close)

    # "auto" resolves off for the shapes the packing cannot express
    deep = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16,
                                    depth=2))
    from rnad_tpu.ops import stepping
    packed = stepping.make_packed_tables(small_tree)
    assert rnad_lib.resolve_rows_actor(deep, packed, small_cfg()) is None
    assert rnad_lib.resolve_rows_actor(net, packed, small_cfg()) is not None
    with pytest.raises(ValueError, match="depth=1"):
        rnad_lib.resolve_rows_actor(deep, packed,
                                    small_cfg(rollout_rows_actor="on"))


def test_ema_and_rotation(small_tree):
    cfg = small_cfg(gamma_averaging=0.5)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state0 = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    state1, _ = train_step(state0, jnp.float32(0.0))

    # EMA: target = g * learner + (1 - g) * old target
    leaf = lambda vs: np.asarray(
        vs["params"]["policy_fc1"]["kernel"])
    expected = 0.5 * leaf(state1.variables) + 0.5 * leaf(state0.variables_target)
    np.testing.assert_allclose(leaf(state1.variables_target), expected,
                               atol=1e-6)

    # rotation: reg_prev <- reg, reg <- target
    rotated = rnad_lib.rotate_regularization_nets(state1)
    np.testing.assert_array_equal(leaf(rotated.variables_reg_),
                                  leaf(state1.variables_reg))
    np.testing.assert_array_equal(leaf(rotated.variables_reg),
                                  leaf(state1.variables_target))


def test_checkpoint_resume_exact(tmp_path, small_tree):
    cfg = small_cfg()
    ncfg = NetConfig(type="MLP", max_actions=3, width=16)
    t1 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="run",
                       runs_root=str(tmp_path), seed=0)
    t1.run(checkpoint_mod=2, expl_mod=10, log_mod=100)
    steps_done = int(t1.state.total_steps)
    assert steps_done == 2 * 4  # bounds=(2,) x delta_m=(4,)

    # resume: a fresh object must pick up the latest checkpoint
    t2 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="run",
                       runs_root=str(tmp_path), seed=0)
    t2.initialize()
    assert (t2.m, t2.n) == t1.store.latest()
    chk = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        t2.state.variables, t1.store.load_checkpoint(
            *t1.store.latest(), t1.state).variables)
    assert jax.tree.all(chk)


def test_tree_hash_guard(tmp_path, small_tree, tiny_tree):
    cfg = small_cfg()
    ncfg = NetConfig(type="MLP", max_actions=3, width=16)
    t1 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="guard",
                       runs_root=str(tmp_path), seed=0)
    t1.initialize()
    t1.n = 1
    t1.save_checkpoint()

    # same directory, different tree -> must refuse to resume
    t_other = rnad_lib.RNaD(
        jax.tree.map(lambda x: x, small_tree).replace(hash=123456),
        cfg, ncfg, directory_name="guard", runs_root=str(tmp_path), seed=0)
    with pytest.raises(AssertionError):
        t_other.initialize()


def test_same_init_net_as(tmp_path, small_tree):
    cfg = small_cfg()
    ncfg = NetConfig(type="MLP", max_actions=3, width=16)
    t1 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="base",
                       runs_root=str(tmp_path), seed=0)
    t1.initialize()
    t2 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="other",
                       runs_root=str(tmp_path), seed=99,
                       use_same_init_net_as="base")
    t2.initialize()
    chk = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        t1.state.variables, t2.state.variables)
    assert jax.tree.all(chk)


def test_buffered_offpolicy_path(small_tree):
    cfg = small_cfg(n_batches_per_buffer=2, buffer_mod=1, batch_size=32)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    _, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(net, small_tree,
                                                          cfg)
    from rnad_tpu.learn.buffer import TrajectoryBuffer

    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    buf = TrajectoryBuffer(2)
    rng = np.random.default_rng(0)
    for _ in range(3):
        state, traj = rollout_jit(state)
        buf.append(traj)
        sample = buf.sample(32, rng)
        assert sample.batch_size == 32
        state, metrics = learn_jit(state, sample, jnp.float32(0.5))
        assert np.isfinite(float(metrics["loss"]))
    assert len(buf) == 2  # deque respects max size


def test_buffer_exact_split_small_slots(small_tree):
    """sample() must return exactly batch_size lanes even when the
    multinomial allocates more lanes to a slot than it holds (the reference
    asserts the exact split, episode.py:318) — and fall back to sampling
    with replacement when the whole buffer is smaller than the batch."""
    from rnad_tpu.learn.buffer import TrajectoryBuffer

    cfg = small_cfg(batch_size=8)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    _, rollout_jit, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    state, traj8 = rollout_jit(state)  # 8 lanes per slot
    rng = np.random.default_rng(0)

    buf = TrajectoryBuffer(4)
    for _ in range(3):
        buf.append(traj8)
    for request in (3, 8, 20, 24):  # 20/24 force clipping+redistribution
        sample = buf.sample(request, rng)
        assert sample.batch_size == request

    # whole buffer (24 lanes) smaller than the batch: replacement kicks in
    sample = buf.sample(30, rng)
    assert sample.batch_size == 30

    # the with-replacement remainder must spread across slots, not pile on
    # slot 0 (which would overweight its episodes in the off-policy
    # gradient).  Tag each slot's lanes through the values field and check
    # the per-slot sample shares stay near-uniform on average.
    import jax as _jax
    tagged = [_jax.tree.map(lambda x: x, traj8) for _ in range(3)]
    tagged = [t.replace(values=jnp.full_like(t.values, float(i)))
              for i, t in enumerate(tagged)]
    buf2 = TrajectoryBuffer(4)
    for t in tagged:
        buf2.append(t)
    counts = np.zeros(3)
    draws = 60
    for s in range(draws):
        samp = buf2.sample(30, np.random.default_rng(s))
        tags = np.asarray(samp.values[0]).astype(int)
        for i in range(3):
            counts[i] += (tags == i).sum()
    shares = counts / (30 * draws)
    assert abs(shares - 1 / 3).max() < 0.05, shares


def test_offpolicy_resume_empty_buffer(tmp_path, small_tree):
    """Resume at a total_steps not divisible by buffer_mod must roll out
    before the first sample instead of crashing on an empty buffer (the
    reference shares this crash; see learn/rnad.py host loop)."""
    cfg = small_cfg(n_batches_per_buffer=2, buffer_mod=2, batch_size=32,
                    bounds=(2,), delta_m=(2, 2))
    ncfg = NetConfig(type="MLP", max_actions=3, width=16)
    t1 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="offres",
                       runs_root=str(tmp_path), seed=0)
    t1.run(max_updates=1, checkpoint_mod=1, expl_mod=10**9, log_mod=10**9)
    assert int(t1.state.total_steps) == 2
    # checkpoints are written BEFORE each step, so the latest on disk is
    # (m=0, n=1) with total_steps=1 — odd: 1 % buffer_mod != 0, the case
    # that crashed on an empty buffer before the fix
    assert t1.store.latest() == (0, 1)

    t2 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="offres",
                       runs_root=str(tmp_path), seed=0)
    t2.run(max_updates=1, checkpoint_mod=10**9, expl_mod=10**9,
           log_mod=10**9)
    assert int(t2.state.total_steps) == 2  # resumed 1 -> 2 without crashing


def test_alpha_schedule():
    assert rnad_lib.alpha_schedule(0, 100) == 0.0
    assert rnad_lib.alpha_schedule(25, 100) == 0.5
    assert rnad_lib.alpha_schedule(51, 100) == 1.0
    assert rnad_lib.alpha_schedule(99, 100) == 1.0


def test_convnet_train_step(small_tree):
    """ConvNet with BatchNorm: mutable batch_stats must flow through the
    fused step and the EMA."""
    cfg = small_cfg(batch_size=32)
    net = nets.build_net(NetConfig(type="ConvNet", max_actions=3, channels=4,
                                   depth=1, batch_norm=True))
    train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    assert "batch_stats" in state.variables
    before = np.asarray(
        state.variables["batch_stats"]["block0"]["bn0"]["mean"]).copy()
    state, metrics = train_step(state, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(state.variables["batch_stats"]["block0"]["bn0"]["mean"])
    assert not np.array_equal(before, after)


def test_equinet_train_step(small_tree):
    """The equivariant net runs through the generic (non-MLP-fused) learner
    path like any other family — here with RM+ solver-iterate input
    features enabled, so the fori_loop solve sits inside the rollout scan
    AND under the learner's grad."""
    cfg = small_cfg(batch_size=32)
    net = nets.build_net(NetConfig(type="EquiNet", max_actions=3, channels=8,
                                   depth=2, solver_iters=8))
    train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)
    state, metrics = train_step(state, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))


def test_fused_step_equals_decomposed(small_tree):
    """The fused on-policy train step and the rollout_jit + learn_jit pair
    (used by the buffered path) must produce identical states."""
    cfg = small_cfg(batch_size=48)
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    train_step, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(
        net, small_tree, cfg)
    state0 = rnad_lib.init_train_state(net, jax.random.PRNGKey(7), 3, cfg)

    state_a, metrics_a = train_step(state0, jnp.float32(0.3))

    state_b, traj = rollout_jit(state0)
    state_b, metrics_b = learn_jit(state_b, traj, jnp.float32(0.3))

    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-6)
    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        state_a.variables, state_b.variables)
    assert jax.tree.all(same)


def test_light_metrics_same_update(small_tree):
    """detailed_metrics=False drops the diagnostic metrics from the compiled
    step but must not change the update itself (the diagnostics are pure
    observers)."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    states, metric_sets = [], []
    for detailed in (True, False):
        cfg = small_cfg(batch_size=48, detailed_metrics=detailed)
        train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(3), 3, cfg)
        state, metrics = train_step(state, jnp.float32(0.5))
        states.append(state)
        metric_sets.append(metrics)
    detailed_m, light_m = metric_sets
    assert set(light_m) == {"loss", "loss_v", "loss_nerd", "gradient_norm"}
    assert set(light_m) < set(detailed_m)
    for k in light_m:
        np.testing.assert_allclose(float(light_m[k]), float(detailed_m[k]),
                                   rtol=1e-6)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        states[0].variables, states[1].variables)
    assert jax.tree.all(same)


def test_stored_obs_same_update(small_tree):
    """store_rollout_obs on/off must produce bit-identical train steps (the
    stored views equal the re-derived ones; test_engine covers the views
    themselves)."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    states = []
    for store in (True, False):
        cfg = small_cfg(batch_size=48, store_rollout_obs=store)
        train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(3), 3, cfg)
        state, _ = train_step(state, jnp.float32(0.5))
        states.append(state)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        states[0].variables, states[1].variables)
    assert jax.tree.all(same)


def test_fuse_net_passes_same_update(small_tree):
    """fuse_net_passes 'frozen' / 'all' pack the step's identical-shape MLP
    forwards into one matmul pair (nets.mlp_multi_net_forward).  The packing
    only widens contractions with exact-zero blocks and concatenates along
    the non-reduced axis, so the update must match the separate-pass path to
    reduction-order tolerance (bit-identical on CPU's sequential dots)."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    states, metric_sets = [], []
    modes = ("off", "heads", "frozen", "all")
    for mode in modes:
        cfg = small_cfg(batch_size=48, fuse_net_passes=mode)
        train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(3), 3, cfg)
        state, metrics = train_step(state, jnp.float32(0.5))
        states.append(state)
        metric_sets.append(metrics)
    base = states[0]
    for mode_i, other in enumerate(states[1:], start=1):
        close = jax.tree.map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b),
                                     rtol=2e-6, atol=1e-7),
            base.variables, other.variables)
        assert jax.tree.all(close), modes[mode_i]
    for m in metric_sets[1:]:
        np.testing.assert_allclose(float(m["loss"]),
                                   float(metric_sets[0]["loss"]), rtol=1e-5)


def test_fuse_net_passes_heads_deep_mlp_and_light_metrics(small_tree):
    """'heads' supports deep MLP heads and must match 'off' to ulp
    tolerance with detailed metrics off (where the target policy head is
    dead); batched-vs-separate dots accumulate in different orders, so
    bitwise equality is not guaranteed."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16,
                                   depth=2))
    states = []
    for mode in ("off", "heads"):
        cfg = small_cfg(batch_size=48, fuse_net_passes=mode,
                        detailed_metrics=False)
        train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(3), 3, cfg)
        state, _ = train_step(state, jnp.float32(0.5))
        states.append(state)
    close = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b),
                                 rtol=2e-6, atol=1e-7),
        states[0].variables, states[1].variables)
    assert jax.tree.all(close)


def test_fuse_net_passes_auto_and_rejections(small_tree):
    deep = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16,
                                    depth=2))
    flat = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    conv = nets.build_net(NetConfig(type="ConvNet", max_actions=3,
                                    channels=4))
    assert rnad_lib.resolve_fuse_mode(flat, small_cfg(
        fuse_net_passes="auto")) == "heads"
    assert rnad_lib.resolve_fuse_mode(deep, small_cfg(
        fuse_net_passes="auto")) == "heads"
    assert rnad_lib.resolve_fuse_mode(conv, small_cfg(
        fuse_net_passes="auto")) == "off"
    with pytest.raises(ValueError, match="depth-1 MLP"):
        rnad_lib.resolve_fuse_mode(deep, small_cfg(fuse_net_passes="frozen"))
    with pytest.raises(ValueError, match="MLP"):
        rnad_lib.resolve_fuse_mode(conv, small_cfg(fuse_net_passes="heads"))
    with pytest.raises(ValueError, match="frozen_net_dtype"):
        rnad_lib.resolve_fuse_mode(flat, small_cfg(
            fuse_net_passes="all", frozen_net_dtype="bfloat16"))
    with pytest.raises(ValueError, match="unknown"):
        rnad_lib.resolve_fuse_mode(flat, small_cfg(fuse_net_passes="bogus"))


def test_flat_optimizer_bit_exact(small_tree):
    """flat_optimizer=True (one raveled clip+Adam+EMA vector chain) must be
    BIT-identical to the per-leaf optax path over several steps — every op
    is elementwise and the global-norm reduction keeps optax's per-leaf
    order, so raveling cannot change any bit."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    states = []
    for flat in (False, True):
        cfg = small_cfg(batch_size=48, flat_optimizer=flat)
        train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(7), 3, cfg)
        for _ in range(3):
            state, _ = train_step(state, jnp.float32(0.5))
        states.append(state)
    a, b = states
    for name, ta, tb in (("variables", a.variables, b.variables),
                         ("target", a.variables_target, b.variables_target),
                         ("opt_state", a.opt_state, b.opt_state)):
        same = jax.tree.map(
            lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
            ta, tb)
        assert jax.tree.all(same), name


def test_flat_optimizer_equinet_fallback(small_tree):
    """A bf16-compute EquiNet keeps f32 params, so the flat path still
    applies; the test just asserts the step runs and is finite with
    flat_optimizer=True for a non-MLP family."""
    net = nets.build_net(NetConfig(type="EquiNet", max_actions=3,
                                   channels=8, depth=1, solver_iters=4))
    cfg = small_cfg(batch_size=48, flat_optimizer=True)
    train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(2), 3, cfg)
    state, metrics = train_step(state, jnp.float32(0.5))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_learner_layout_bit_exact(small_tree):
    """learner_layout='amb' (batch-minor v-trace/losses) must match the
    reference 'bma' layout to ulp tolerance over several train steps.

    The isolated functions are bitwise identical (test_vtrace_minor.py);
    inside the fused jitted step the two layouts are different programs,
    and XLA's fusion/FMA formation may differ by the last ulp (the same
    tolerance class as fuse_net_passes='heads' vs 'off')."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    states = []
    for layout in ("bma", "amb"):
        cfg = small_cfg(batch_size=48, learner_layout=layout)
        train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(5), 3, cfg)
        metrics = None
        for _ in range(3):
            state, metrics = train_step(state, jnp.float32(0.5))
        states.append((state, metrics))
    (a, ma), (b, mb) = states
    close = jax.tree.map(
        lambda x, y: np.allclose(np.asarray(x), np.asarray(y),
                                 rtol=1e-5, atol=1e-7),
        (a.variables, a.variables_target),
        (b.variables, b.variables_target))
    assert jax.tree.all(close)
    for k in ma:
        assert np.allclose(np.asarray(ma[k]), np.asarray(mb[k]),
                           rtol=1e-4, atol=1e-6), k


def test_learner_layout_amb_rejects_assoc(small_tree):
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    cfg = small_cfg(batch_size=48, learner_layout="amb",
                    vtrace_mode="associative")
    with pytest.raises(ValueError, match="sequential-scan"):
        rnad_lib.make_rnad_fns(net, small_tree, cfg)


@pytest.mark.parametrize("net_cfg", [
    NetConfig(type="EquiNet", max_actions=3, channels=8, depth=1,
              solver_iters=8, solver_prime=True),
    NetConfig(type="ConvNet", max_actions=3, channels=8, depth=1),
])
def test_learner_layout_all_families(small_tree, net_cfg):
    """The batch-minor layout is net-family-agnostic (it starts after the
    net forwards): EquiNet/ConvNet steps must match the reference layout
    to ulp tolerance too."""
    net = nets.build_net(net_cfg)
    states = []
    for layout in ("bma", "amb"):
        cfg = small_cfg(batch_size=48, learner_layout=layout)
        train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(9), 3, cfg)
        state, metrics = train_step(state, jnp.float32(0.5))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (net_cfg.type, k)
        states.append(state)
    a, b = states
    close = jax.tree.map(
        lambda x, y: np.allclose(np.asarray(x), np.asarray(y),
                                 rtol=1e-5, atol=1e-7),
        a.variables, b.variables)
    assert jax.tree.all(close), net_cfg.type


def test_lr_schedule_cosine_decays_updates(small_tree):
    """lr_schedule="cosine": the optimizer's effective step size must track
    optax.cosine_decay_schedule; "constant" stays the reference-exact fixed
    lr (and keeps the reference opt_state layout)."""
    import optax

    cfg = small_cfg(lr=1e-2, lr_schedule="cosine", lr_decay_steps=8,
                    lr_final_fraction=0.1)
    tx = rnad_lib.make_optimizer(cfg)
    params = {"w": jnp.zeros((4,))}
    opt_state = tx.init(params)
    g = {"w": jnp.ones((4,))}
    sched = optax.cosine_decay_schedule(1e-2, 8, alpha=0.1)
    for step in range(10):
        updates, opt_state = tx.update(g, opt_state, params)
        # constant gradient -> Adam's normalized direction is 1, so the
        # update magnitude IS the scheduled lr (up to eps)
        got = float(-updates["w"][0])
        want = float(sched(step))
        assert abs(got - want) < 1e-4 * max(want, 1e-9), (step, got, want)

    # guard rails
    with pytest.raises(ValueError, match="lr_decay_steps"):
        rnad_lib.make_optimizer(small_cfg(lr_schedule="cosine"))
    with pytest.raises(ValueError, match="lr_schedule"):
        rnad_lib.make_optimizer(small_cfg(lr_schedule="warmup"))


def test_lr_schedule_train_step_and_flat_fallback(small_tree):
    """A full train step under the cosine schedule is finite, and
    flat_optimizer (whose raveled tail assumes the constant lr) silently
    falls back to the optax path — both configs produce the identical
    update."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    states = []
    for flat in (False, True):
        cfg = small_cfg(lr_schedule="cosine", lr_decay_steps=16,
                        flat_optimizer=flat)
        train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
        state = rnad_lib.init_train_state(net, jax.random.PRNGKey(3), 3, cfg)
        state, metrics = train_step(state, jnp.float32(0.5))
        assert np.isfinite(float(metrics["loss"]))
        states.append(state)
    same = jax.tree.map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
        states[0].variables, states[1].variables)
    assert jax.tree.all(same)


def test_best_checkpoint_tracking(tmp_path, small_tree):
    """RNaD.run must store the best-evaluated EMA target (best.ckpt +
    best.json) and never overwrite it with a worse later eval; a resumed
    run keeps improving on the stored best (utils/checkpoint.py::
    RunStore.save_best)."""
    import json as _json
    import os as _os

    cfg = small_cfg(bounds=(3,), delta_m=(2,))
    ncfg = NetConfig(type="MLP", max_actions=3, width=16)
    t1 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="bestrun",
                       runs_root=str(tmp_path), seed=0)
    t1.run(max_updates=3, checkpoint_mod=10**9, expl_mod=1, log_mod=10**9)

    best_json = _os.path.join(str(tmp_path), "bestrun", "best.json")
    assert _os.path.exists(best_json)
    with open(best_json) as f:
        meta = _json.load(f)
    # the stored best must equal the minimum of the logged evals
    evals = []
    with open(_os.path.join(str(tmp_path), "bestrun",
                            "metrics.jsonl")) as f:
        for line in f:
            rec = _json.loads(line)
            if "nashconv" in rec:
                evals.append(rec["nashconv"])
    assert evals and abs(meta["nashconv"] - min(evals)) < 1e-9

    # load_best restores a state whose target net reproduces the eval
    template = rnad_lib.init_train_state(
        t1.net, jax.random.PRNGKey(0), 3, cfg)
    best_state, meta2 = t1.store.load_best(template)
    assert meta2 == meta
    from rnad_tpu.metrics import nashconv as nc
    got = float(t1.nashconv_fn(best_state.variables_target).nashconv())
    assert abs(got - meta["nashconv"]) < 1e-5

    # a fresh RNaD on the same directory resumes with the stored best as
    # the bar (no overwrite by a worse eval): run one more update and
    # check best.json never got worse
    t2 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="bestrun",
                       runs_root=str(tmp_path), seed=0)
    t2.run(max_updates=1, checkpoint_mod=10**9, expl_mod=1, log_mod=10**9)
    with open(best_json) as f:
        meta3 = _json.load(f)
    assert meta3["nashconv"] <= meta["nashconv"] + 1e-12


def test_policy_warmup_gates_neurd(small_tree):
    """policy_warmup_steps (critic-first warmup): while total_steps <
    warmup the NeuRD loss is gated to zero — the MLP's policy tower
    (separate from the value tower) stays bitwise frozen while the value
    tower trains; once the gate lifts, the policy tower moves.  The gate
    is a traced function of TrainState.total_steps (learn/rnad.py::
    neurd_scale_for), so one compiled program serves both phases and the
    gate survives resume."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    cfg = small_cfg(policy_warmup_steps=2)
    train_step, _, _, _ = rnad_lib.make_rnad_fns(net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 3, cfg)

    p0 = jax.tree.map(np.asarray, state.variables["params"])
    for step in range(3):
        state, metrics = train_step(state, jnp.float32(0.5))
        assert np.isfinite(float(metrics["loss"]))
        p = state.variables["params"]
        pol_frozen = all(
            np.array_equal(np.asarray(p[k][n]), p0[k][n])
            for k in p if k.startswith("policy") for n in p[k])
        val_moved = any(
            not np.array_equal(np.asarray(p[k][n]), p0[k][n])
            for k in p if k.startswith("value") for n in p[k])
        if step < 2:  # total_steps was 0 then 1 when the loss ran
            assert pol_frozen, step
            assert val_moved, step
        else:
            assert not pol_frozen, step


def test_policy_warmup_shard_map_matches_single_device(small_tree):
    """The shard_map learner applies the same warmup gate: with
    policy_warmup_steps set, its update on a fixed trajectory equals the
    unsharded learn_fn's bitwise (same guarantee as the ungated path)."""
    from rnad_tpu.parallel import mesh as mesh_lib
    from rnad_tpu.parallel import shard_map_step

    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    cfg = small_cfg(batch_size=16, policy_warmup_steps=1)
    train_step, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(
        net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(1), 3, cfg)
    state, traj = rollout_jit(state)

    mesh = mesh_lib.make_mesh(jax.devices()[:min(4, len(jax.devices()))])
    learn_sm = shard_map_step.make_shard_map_learn_step(
        net, small_tree, cfg, mesh)
    ref_state, _ = learn_jit(state, traj, jnp.float32(0.5))
    got_state, _ = learn_sm(state, traj, jnp.float32(0.5))
    # total_steps=0 < warmup: the policy tower must be frozen in BOTH paths
    for k in ref_state.variables["params"]:
        if k.startswith("policy"):
            for n, w in ref_state.variables["params"][k].items():
                assert np.array_equal(
                    np.asarray(w),
                    np.asarray(state.variables["params"][k][n])), (k, n)
    same = jax.tree.map(
        lambda x, y: np.allclose(np.asarray(x), np.asarray(y),
                                 rtol=1e-6, atol=1e-7),
        ref_state.variables, got_state.variables)
    assert jax.tree.all(same)


def test_wide_action_space_default_layout(monkeypatch):
    """An A>16 tree must never be routed to the batch-minor learner path
    (process_policy_minor's pairwise discretizer caps at A=16): 'auto'
    falls back to batch-major even on TPU backends, explicit 'amb' raises
    a clear error, and a default-config train step runs (round-4 verdict:
    the unguarded auto resolution crashed any max_actions>16 tree on the
    default TPU config; reference trees are unrestricted, tree.py:67-75)."""
    from rnad_tpu.config import TreeConfig
    from rnad_tpu.env import tree as tree_lib

    cfg = small_cfg(learner_layout="auto")
    # force the TPU branch of the backend check
    monkeypatch.setattr(rnad_lib.jax, "default_backend", lambda: "tpu")
    assert rnad_lib.resolve_learner_layout(cfg, False, max_actions=20) \
        is False
    assert rnad_lib.resolve_learner_layout(cfg, False, max_actions=16) \
        is True
    with pytest.raises(ValueError, match="max_actions"):
        rnad_lib.resolve_learner_layout(
            small_cfg(learner_layout="amb"), False, max_actions=20)
    monkeypatch.undo()

    tree = tree_lib.generate_tree(
        TreeConfig(max_actions=20, max_transitions=1, depth_bound=2),
        seed=1)
    assert tree.max_actions == 20
    net = nets.build_net(NetConfig(type="MLP", max_actions=20, width=32))
    train_step, _, _, _ = rnad_lib.make_rnad_fns(net, tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(0), 20, cfg)
    state, metrics = train_step(state, jnp.float32(0.5))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_vtrace_mode_validated(small_tree):
    """A typo'd vtrace_mode must raise, not silently select the scan."""
    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    with pytest.raises(ValueError, match="vtrace_mode"):
        rnad_lib.make_rnad_fns(net, small_tree,
                               small_cfg(vtrace_mode="assocative"))


def test_best_ckpt_atomic_container(tmp_path, small_tree):
    """save_best publishes (state, meta) in ONE rename: load_best_meta
    reads the meta embedded in best.ckpt (never the best.json mirror),
    the legacy bare-msgpack layout still loads, and calling the public
    final_eval() on a fresh object over an existing run directory seeds
    the bar from the store instead of overwriting a better stored best."""
    import os as _os

    from rnad_tpu.utils.checkpoint import RunStore, _BEST_MAGIC

    cfg = small_cfg(bounds=(2,), delta_m=(2,))
    ncfg = NetConfig(type="MLP", max_actions=3, width=16)
    t1 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="atomicrun",
                       runs_root=str(tmp_path), seed=0)
    t1.run(max_updates=2, checkpoint_mod=10**9, expl_mod=1, log_mod=10**9)
    store = RunStore("atomicrun", root=str(tmp_path))
    meta = store.load_best_meta()
    assert meta is not None and np.isfinite(meta["nashconv"])
    with open(_os.path.join(store.directory, "best.ckpt"), "rb") as f:
        assert f.read(len(_BEST_MAGIC)) == _BEST_MAGIC

    template = rnad_lib.init_train_state(
        t1.net, jax.random.PRNGKey(0), 3, cfg)
    state, meta2 = store.load_best(template)
    assert meta2 == meta

    # ADVICE r4: final_eval on a resumed object must not clobber the bar
    t2 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="atomicrun",
                       runs_root=str(tmp_path), seed=0)
    t2.initialize()
    t2.final_eval()
    assert store.load_best_meta()["nashconv"] <= meta["nashconv"] + 1e-12

    # legacy layout: bare msgpack + sibling best.json still loads
    from flax import serialization as _ser
    with open(_os.path.join(store.directory, "best.ckpt"), "wb") as f:
        f.write(_ser.to_bytes(state))
    legacy_state, legacy_meta = store.load_best(template)
    assert _os.path.exists(_os.path.join(store.directory, "best.json"))
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        legacy_state.variables, state.variables)
    assert jax.tree.all(same)


def test_reg_anchor_best_rotation(tmp_path, small_tree):
    """cfg.reg_anchor='best': at an update boundary whose eval is worse
    than the stored best, pi_reg rotates to the BEST checkpoint's EMA
    target (and pi_reg_prev to the old pi_reg) instead of the current
    target; with a better-or-equal eval the reference rotation applies."""
    cfg = small_cfg(bounds=(3,), delta_m=(2,), reg_anchor="best")
    ncfg = NetConfig(type="MLP", max_actions=3, width=16)
    t = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="anchor",
                      runs_root=str(tmp_path), seed=0)
    t.initialize()
    # plant a sentinel best target and an unbeatable best bar, so the next
    # boundary eval is guaranteed "worse"
    sentinel = jax.tree.map(lambda x: jnp.full_like(x, 7.0),
                            t.state.variables_target)
    t._best_nashconv = -1.0
    t._best_target = sentinel
    t._last_nashconv = 1.0
    old_reg = t.state.variables_reg
    t._rotate_for_schedule()
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        t.state.variables_reg, sentinel)
    assert jax.tree.all(same)
    same_prev = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        t.state.variables_reg_, old_reg)
    assert jax.tree.all(same_prev)

    # improving eval -> the reference rotation (reg <- current target)
    t._last_nashconv = -2.0
    t._rotate_for_schedule()
    same_t = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        t.state.variables_reg, t.state.variables_target)
    assert jax.tree.all(same_t)

    # end-to-end: a short run under the mode stays finite and stores a best
    t2 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="anchor2",
                       runs_root=str(tmp_path), seed=0)
    t2.run(max_updates=3, checkpoint_mod=10**9, expl_mod=1, log_mod=10**9)
    assert t2.store.load_best_meta() is not None

    with pytest.raises(ValueError, match="reg_anchor"):
        t3 = rnad_lib.RNaD(small_tree, small_cfg(reg_anchor="bets"), ncfg,
                           directory_name="anchor3", runs_root=str(tmp_path),
                           seed=0)
        t3.run(max_updates=1)


def test_reg_anchor_fixed_never_rotates(tmp_path, small_tree):
    """cfg.reg_anchor='fixed': update boundaries leave BOTH reg nets at the
    init nets (KL-anchored fine-tuning, docs/SCALE.md (d)); training
    otherwise proceeds (params change, evals run, best is stored)."""
    cfg = small_cfg(bounds=(3,), delta_m=(2,), reg_anchor="fixed")
    ncfg = NetConfig(type="MLP", max_actions=3, width=16)
    t = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="anchf",
                      runs_root=str(tmp_path), seed=0)
    t.initialize()
    init_reg = jax.tree.map(lambda x: np.asarray(x).copy(),
                            t.state.variables_reg)
    t._rotate_for_schedule()
    for name, tree_now in (("reg", t.state.variables_reg),
                           ("reg_", t.state.variables_reg_)):
        same = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            tree_now, init_reg)
        assert jax.tree.all(same), name

    t2 = rnad_lib.RNaD(small_tree, cfg, ncfg, directory_name="anchf2",
                       runs_root=str(tmp_path), seed=0)
    t2.run(max_updates=3, checkpoint_mod=10**9, expl_mod=1, log_mod=10**9)
    # reg nets still the init nets after 3 boundaries...
    same_end = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        t2.state.variables_reg, t2.state.variables_reg_)
    assert jax.tree.all(same_end)
    # ...while the learned params moved and an eval was stored
    moved = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        t2.state.variables, t2.state.variables_reg)
    assert any(jax.tree.leaves(moved))
    assert t2.store.load_best_meta() is not None


def test_fused_sample_learn_matches_collate_then_learn(small_tree):
    """The fused sample+learn program (learn_jit.sampled, fed by
    TrajectoryBuffer.plan) must produce the same update as collating the
    sample in its own program and then calling learn_jit."""
    from rnad_tpu.learn import buffer as buffer_lib

    net = nets.build_net(NetConfig(type="MLP", max_actions=3, width=16))
    cfg = small_cfg(batch_size=32, n_batches_per_buffer=3, buffer_mod=2)
    train_step, rollout_jit, learn_jit, _ = rnad_lib.make_rnad_fns(
        net, small_tree, cfg)
    state = rnad_lib.init_train_state(net, jax.random.PRNGKey(3), 3, cfg)
    buf = rnad_lib.TrajectoryBuffer(3)
    for _ in range(3):
        state, traj = rollout_jit(state)
        buf.append(traj)

    rng = np.random.default_rng(0)
    slots, lanes = buf.plan(cfg.batch_size, rng)
    assert lanes is not None and len(slots) == 3
    sample = buffer_lib.collate_slots(slots, lanes)
    ref_state, ref_metrics = learn_jit(state, sample, jnp.float32(0.5))
    got_state, got_metrics = learn_jit.sampled(state, slots, lanes,
                                               jnp.float32(0.5))
    for k in ref_metrics:
        np.testing.assert_allclose(float(ref_metrics[k]),
                                   float(got_metrics[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    close = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b),
                                 rtol=1e-6, atol=1e-8),
        ref_state.variables, got_state.variables)
    assert jax.tree.all(close)

    # the single-full-slot fast path routes through plain learn_jit
    buf2 = rnad_lib.TrajectoryBuffer(1)
    buf2.append(traj)
    slots2, lanes2 = buf2.plan(cfg.batch_size, rng)
    assert lanes2 is None
    s2, _ = learn_jit.sampled(state, slots2, lanes2, jnp.float32(0.5))
    s2_ref, _ = learn_jit(state, traj, jnp.float32(0.5))
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        s2.variables, s2_ref.variables)
    assert jax.tree.all(same)
