"""Vmapped multi-model training engine.

One jitted program trains every (config, fold) pair of a shape-class group
simultaneously: `jax.vmap(jax.vmap(train_one))` over leading axes
(configs, folds).  The whole run — step loop, eval, metric computation,
best-checkpoint selection — is a `lax.scan` on device; the host only
uploads data once and downloads the final best params/metrics.

This replaces the reference's 90 (18 configs x 5 folds) sequential torch
runs (`train_baseline_cv.py:270-278` driven once per --config) with 3
compiled programs, and its per-step host syncs (sklearn class weights
`:168-169`, `.item()` logging) with in-graph equivalents.

Parallelism: the (config, fold) leading axes are exactly the axes a
`jax.sharding.Mesh('model', 'data')` shards; see `parallel/` for the
NamedSharding constructors used by the multi-chip path.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit3d_ensemble_tpu.data import EpochBatcher
from vit3d_ensemble_tpu.metrics.jax_metrics import compute_eval_metrics
from vit3d_ensemble_tpu.models import VisionTransformer3D
from vit3d_ensemble_tpu.sweep.stack import (
    ConfigGroup,
    group_configs,
    init_group_params,
)
from vit3d_ensemble_tpu.train.optim import sgd_momentum
from vit3d_ensemble_tpu.train.schedules import make_schedule
from vit3d_ensemble_tpu.train.selection import (
    device_best_init,
    device_consider,
    device_take_if,
)
from vit3d_ensemble_tpu.train.steps import (
    masked_balanced_pos_weight,
    masked_bce_with_logits,
)

logger = logging.getLogger(__name__)

#: Canonical metric order for on-device (11,) metric vectors — matches the
#: reference's per-fold dict layout (`train_baseline_cv.py:286-297`).
METRIC_KEYS = ("Specificity", "Sensitivity", "Accuracy", "AUROC", "AUPRC",
               "F2-score", "CSP", "CSE", "BSNC", "BSPC", "BS")


def _metrics_vector(m) -> jnp.ndarray:
    return jnp.stack([
        m.specificity, m.sensitivity, m.balanced_accuracy, m.auroc, m.auprc,
        m.f2, m.csp, m.cse, m.bsnc, m.bspc, m.brier,
    ])


@dataclasses.dataclass(frozen=True)
class SweepHyper:
    num_steps: int = 100
    eval_every: int = 24
    train_batch_size: int = 4
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2
    warmup_steps: int = 1000
    decay_type: str = "cosine"
    balanced_weights: bool = True
    seed: int = 42
    #: Snapshot the full train state (params + optimizer + best-metric
    #: state) every this many eval periods, so a preempted group resumes
    #: mid-run instead of restarting (SURVEY.md §5 failure detection).
    #: 0 = off: the whole run is one device program, as before.
    snapshot_every: int = 0
    #: Rematerialize encoder blocks in the backward pass (jax.checkpoint;
    #: numerics-identical — see models/vit3d.Encoder.remat).  The e2e
    #: ensemble grid measured ~3x faster TPU compiles and large memory
    #: savings from this at the same step time.
    remat: bool = False


class SimulatedPreemption(RuntimeError):
    """Raised by run_group's test-only `_abort_after_segments` hook."""


@dataclasses.dataclass
class FoldData:
    """Per-fold views into a shared volume pool, padded to common sizes.

    Folds/replicates gather from ONE device-resident un-normalized pool and
    mean-center in-graph (see `data/pool.py`): 100 bootstrap replicates cost
    one pool, not 100 copies.
    """

    pool: np.ndarray            # (P, H, W, Z, C) float32, un-normalized
    row_idx: np.ndarray         # (F, N) int32 rows into pool
    train_labels: np.ndarray    # (F, N) float32
    mean: np.ndarray            # (F,) float32 per-fold normalization mean
    batch_idx: np.ndarray       # (F, S, B) int32 into row_idx
    batch_mask: np.ndarray      # (F, S, B) float32
    val_idx: np.ndarray         # (F, V) int32 rows into pool
    val_labels: np.ndarray      # (F, V) float32
    val_mask: np.ndarray        # (F, V) float32

    @property
    def n_folds(self) -> int:
        return self.row_idx.shape[0]


def stack_folds(pool, folds, hyper: SweepHyper) -> FoldData:
    """Pad per-fold pool views to common sizes + precompute batch schedules.

    pool: VolumePool; folds: [(PooledSplit train, PooledSplit val), ...].
    The batch order is per-fold (shared across the configs of a group —
    scientifically equivalent to the reference's per-run shuffles, and it
    lets one gather serve every config).
    """
    F = len(folds)
    n_max = max(len(t.row_idx) for t, _ in folds)
    v_max = max(len(v.row_idx) for _, v in folds)
    B, S = hyper.train_batch_size, hyper.num_steps

    row_idx = np.zeros((F, n_max), np.int32)
    train_labels = np.zeros((F, n_max), np.float32)
    mean = np.zeros((F,), np.float32)
    batch_idx = np.zeros((F, S, B), np.int32)
    batch_mask = np.zeros((F, S, B), np.float32)
    val_idx = np.zeros((F, v_max), np.int32)
    val_labels = np.zeros((F, v_max), np.float32)
    val_mask = np.zeros((F, v_max), np.float32)

    for f, (t, v) in enumerate(folds):
        n, vn = len(t.row_idx), len(v.row_idx)
        row_idx[f, :n] = t.row_idx
        train_labels[f, :n] = t.labels
        mean[f] = t.mean
        val_idx[f, :vn] = v.row_idx
        val_labels[f, :vn] = v.labels
        val_mask[f, :vn] = 1.0
        batcher = EpochBatcher(n, B, seed=hyper.seed)
        for s, (idx, msk) in enumerate(batcher.batches(S)):
            batch_idx[f, s] = idx
            batch_mask[f, s] = msk
    pool_vols = getattr(pool, "volumes", pool)
    return FoldData(pool_vols, row_idx, train_labels, mean, batch_idx,
                    batch_mask, val_idx, val_labels, val_mask)


@dataclasses.dataclass
class GroupResult:
    group: ConfigGroup
    best_metrics: np.ndarray     # (G, F, 11)
    best_probs: np.ndarray       # (G, F, V)
    best_params: dict            # stacked padded, leading (G, F) — kept ON
    #                              DEVICE; crop+fetch true shapes with
    #                              stack.unpad_group_params (padded fetch
    #                              moves ~4x the bytes over the link)
    final_loss: np.ndarray       # (G, F)

    def metrics_dict(self, g: int, f: int) -> Dict[str, float]:
        return {k: float(v) for k, v in zip(METRIC_KEYS,
                                            self.best_metrics[g, f])}


def make_group_programs(group: ConfigGroup, hyper: SweepHyper,
                        img_size: int = 128):
    """Build the jitted (G, F)-vmapped (init, segment, finalize) programs.

    Training is segmented at eval-period granularity so `run_group` can
    snapshot the carry (params + optimizer + rng + best-metric state)
    between segments for preemption recovery.  With snapshot_every=0 the
    whole run is one segment — one device program, the original behavior.
    """
    template = group.template_config(img_size)
    model = VisionTransformer3D(template, zero_head=True, vis=False,
                                remat=hyper.remat)
    schedule = make_schedule(hyper.decay_type, hyper.learning_rate,
                             hyper.warmup_steps, hyper.num_steps)
    tx = sgd_momentum(schedule, momentum=0.9,
                      weight_decay=hyper.weight_decay)
    E = hyper.eval_every
    S = hyper.num_steps
    periods, rem = divmod(S, E)

    def bind_cell(mlp_active, layers_active, pool, row_idx, train_labels,
                  mean, val_idx, val_labels, val_mask):
        """Per-(config, fold) step/eval closures over that cell's data."""

        def loss_fn(p, bv, bl, bm, drop_rng):
            out = model.apply({"params": p}, bv, deterministic=False,
                              rngs={"dropout": drop_rng},
                              num_layers_active=layers_active,
                              mlp_active=mlp_active)
            pw = (masked_balanced_pos_weight(bl, bm)
                  if hyper.balanced_weights else jnp.float32(1.0))
            return masked_bce_with_logits(out.logits, bl, bm, pw)

        def one_step(carry, im):
            params, opt_state, rng = carry
            idx, bm = im
            rng, sub = jax.random.split(rng)
            bv = pool[row_idx[idx]] - mean
            bl = train_labels[idx]
            loss, grads = jax.value_and_grad(loss_fn)(params, bv, bl, bm, sub)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), loss

        def evaluate(p):
            val_vols = pool[val_idx] - mean
            out = model.apply({"params": p}, val_vols, deterministic=True,
                              num_layers_active=layers_active,
                              mlp_active=mlp_active)
            probs = jax.nn.sigmoid(out.logits.reshape(-1))
            m = compute_eval_metrics(probs, val_labels, val_mask)
            return _metrics_vector(m), probs

        return one_step, evaluate

    DATA_ARGS = 9   # mlp, layers, pool, row_idx, tl, mean, val_idx, vy, vm
    # inner vmap: folds; outer vmap: configs.  The pool is shared (None on
    # both axes) — one HBM copy serves every model.  Carry leaves all lead
    # with the vmapped axes.
    data_fold_axes = (None, None, None, 0, 0, 0, 0, 0, 0)
    data_conf_axes = (0, 0, None, None, None, None, None, None, None)

    def vmapped(fn, extra_fold=(), extra_conf=(), donate=False):
        fold_axes = (0,) + data_fold_axes + tuple(extra_fold)
        conf_axes = (0,) + data_conf_axes + tuple(extra_conf)
        out = jax.vmap(jax.vmap(fn, in_axes=fold_axes), in_axes=conf_axes)
        return jax.jit(out, donate_argnums=(0,) if donate else ())

    def init_one(cell, *data):
        params, rng = cell
        val_idx = data[6]
        return dict(params=params,
                    opt=tx.init(params),
                    rng=rng,
                    best=device_best_init(11, val_idx.shape[0], params),
                    loss=jnp.float32(0.0))

    def segment_one(carry, *args):
        # args: DATA_ARGS data arrays + (chunk_idx (P, E, B), chunk_mask)
        data, (chunk_idx, chunk_mask) = args[:DATA_ARGS], args[DATA_ARGS:]
        one_step, evaluate = bind_cell(*data)

        def period_body(pcarry, chunk):
            inner, best = pcarry
            idxs, masks = chunk
            inner, losses = jax.lax.scan(one_step, inner, (idxs, masks))
            mvec, probs = evaluate(inner[0])
            best = device_consider(best, mvec, probs, inner[0],
                                   jnp.bool_(False))
            return (inner, best), losses[-1]

        inner = (carry["params"], carry["opt"], carry["rng"])
        (inner, best), losses = jax.lax.scan(
            period_body, (inner, carry["best"]), (chunk_idx, chunk_mask))
        return dict(params=inner[0], opt=inner[1], rng=inner[2], best=best,
                    loss=losses[-1])

    def finalize_one(carry, *args):
        data, tail = args[:DATA_ARGS], args[DATA_ARGS:]
        one_step, evaluate = bind_cell(*data)
        inner = (carry["params"], carry["opt"], carry["rng"])
        loss_last = carry["loss"]
        if rem > 0:
            rem_idx, rem_mask = tail
            inner, losses = jax.lax.scan(one_step, inner,
                                         (rem_idx, rem_mask))
            loss_last = losses[-1]
        # If no eval ever accepted (e.g. num_steps < eval_every, or all
        # AUROCs == 0), take a final eval so results are always defined —
        # the reference would crash here (unbound `tl`, defect D9-adjacent).
        best = carry["best"]
        mvec, probs = evaluate(inner[0])
        best = device_take_if(best, mvec, probs, inner[0], ~best["found"])
        return dict(metrics=best["metrics"], probs=best["probs"],
                    params=best["payload"], loss=loss_last)

    init_fn = vmapped(init_one)
    segment_fn = vmapped(segment_one, extra_fold=(0, 0), extra_conf=(None,) * 2,
                         donate=True)
    finalize_fn = vmapped(finalize_one,
                          extra_fold=(0, 0) if rem > 0 else (),
                          extra_conf=(None, None) if rem > 0 else (),
                          donate=True)
    return init_fn, segment_fn, finalize_fn, periods, rem


def _rep_pad(arr: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    """Pad `axis` to length n by repeating entry 0 (duplicate work that
    is cropped from the results; needed only when a mesh axis does not
    divide the true axis length)."""
    if arr.shape[axis] == n:
        return arr
    reps = np.repeat(np.take(arr, [0], axis=axis), n - arr.shape[axis],
                     axis=axis)
    return np.concatenate([arr, reps], axis=axis)


def _save_carry(path: str, carry, segments_done: int) -> None:
    """Persist the (G, F) training carry mid-run (typed rng keys stored as
    raw key data — msgpack cannot serialize extended dtypes)."""
    from vit3d_ensemble_tpu.checkpoint import save_pytree

    c = dict(carry)
    c["rng"] = jax.random.key_data(c["rng"])
    save_pytree(path, {"carry": c,
                       "segments_done": np.asarray(segments_done, np.int64)})


def _restore_carry(path: str, template_np):
    """template_np: host-side (np zeros) pytree matching the saved blob —
    built from eval_shape, NOT from a device fetch (padded params + opt
    state can be hundreds of MB over the remote-device tunnel)."""
    from vit3d_ensemble_tpu.checkpoint import restore_pytree

    blob = restore_pytree(path, {"carry": template_np,
                                 "segments_done": np.asarray(0, np.int64)})
    c = dict(blob["carry"])
    c["rng"] = jax.random.wrap_key_data(jnp.asarray(c["rng"]))
    return c, int(blob["segments_done"])


def run_group(group: ConfigGroup, data: FoldData, hyper: SweepHyper,
              img_size: int = 128, mesh=None, state_path=None,
              resume: bool = False, fold_ids=None, n_folds_total=None,
              _abort_after_segments=None) -> GroupResult:
    """Train one group.  With `mesh` (a jax.sharding.Mesh('model', 'data')),
    the stacked params shard over ('model', 'data'), fold arrays over
    ('data',), and the pool replicates — XLA partitions the program across
    chips with no code changes (see `parallel/mesh.py`).  Axis lengths that
    do not divide the mesh (e.g. 5 folds on a data axis of 4) are padded
    with duplicate work and cropped from the results.

    With hyper.snapshot_every > 0 and a `state_path`, the full carry
    (params + optimizer + rng + best state) is snapshotted every
    snapshot_every eval periods; `resume=True` picks up from the last
    snapshot after preemption.  `_abort_after_segments` is a test-only
    hook that simulates preemption by raising after N segments.
    """
    import os

    F = data.n_folds
    G = len(group.confs)
    if mesh is not None:
        gm, fd = mesh.shape["model"], mesh.shape["data"]
        G_pad = -(-G // gm) * gm
        F_pad = -(-F // fd) * fd
    else:
        G_pad, F_pad = G, F

    params = init_group_params(group, F_pad, hyper.seed, img_size)
    mlp_active = jnp.asarray(_rep_pad(np.asarray(group.mlp_dims, np.int32),
                                      G_pad))
    layers_active = jnp.asarray(_rep_pad(np.asarray(group.num_layers,
                                                    np.int32), G_pad))
    if G_pad > G:
        params = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.repeat(x[:1], G_pad - G, axis=0)]), params)
    # per-cell dropout keys are derived for the TRUE (G, F_total) grid and
    # only then padded — splitting over the padded grid would hand every
    # real cell a different key than the single-device run.  `fold_ids` /
    # `n_folds_total` let a caller train a SLICE of a larger fold axis
    # (the chunked bootstrap: replicates s..s+w-1 of num_rep) with the
    # exact keys the unchunked run would use, so results are invariant to
    # the chunk width; the defaults reproduce the original derivation.
    F_total = F if n_folds_total is None else int(n_folds_total)
    keys = jax.random.split(jax.random.key(hyper.seed), G * F_total)
    keys = keys.reshape(G, F_total)
    if fold_ids is not None:
        keys = keys[:, np.asarray(fold_ids, np.int32)]
    if F_pad > F:
        keys = jnp.concatenate(
            [keys, jnp.broadcast_to(keys[:, :1], (G, F_pad - F))], axis=1)
    if G_pad > G:
        keys = jnp.concatenate(
            [keys, jnp.broadcast_to(keys[:1], (G_pad - G, F_pad))], axis=0)

    arrays = dict(
        pool=data.pool, row_idx=_rep_pad(data.row_idx, F_pad),
        train_labels=_rep_pad(data.train_labels, F_pad),
        mean=_rep_pad(data.mean, F_pad),
        batch_idx=_rep_pad(data.batch_idx, F_pad),
        batch_mask=_rep_pad(data.batch_mask, F_pad),
        val_idx=_rep_pad(data.val_idx, F_pad),
        val_labels=_rep_pad(data.val_labels, F_pad),
        val_mask=_rep_pad(data.val_mask, F_pad))
    if mesh is not None:
        from vit3d_ensemble_tpu.parallel.mesh import shard_group_inputs

        params, keys, arrays = shard_group_inputs(mesh, params, keys, arrays)
    else:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}

    init_fn, segment_fn, finalize_fn, periods, rem = make_group_programs(
        group, hyper, img_size)
    E = hyper.eval_every
    data_args = (mlp_active, layers_active, arrays["pool"],
                 arrays["row_idx"], arrays["train_labels"], arrays["mean"],
                 arrays["val_idx"], arrays["val_labels"], arrays["val_mask"])

    # segment schedule over eval periods
    sp = hyper.snapshot_every if hyper.snapshot_every > 0 else max(periods, 1)
    bounds = list(range(0, periods, sp)) + [periods] if periods else [0, 0]
    carry, seg_done = None, 0
    if resume and state_path and os.path.exists(state_path):
        shapes = dict(jax.eval_shape(init_fn, (params, keys), *data_args))
        shapes["rng"] = jax.eval_shape(jax.random.key_data, keys)
        template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        try:
            carry, seg_done = _restore_carry(state_path, template)
        except Exception as exc:  # truncated/mismatched state: restart group
            logger.warning("resume state %s unreadable (%s); restarting "
                           "the group from scratch", state_path, exc)
            carry, seg_done = None, 0
        else:
            if mesh is not None:
                from vit3d_ensemble_tpu.parallel.mesh import sweep_shardings

                carry = jax.device_put(carry, sweep_shardings(mesh)[0])
            logger.info("resume: group (D=%d, k=%d) continues from "
                        "segment %d", group.hidden_size, group.num_heads,
                        seg_done)
    if carry is None:
        carry = init_fn((params, keys), *data_args)

    bi, bm = arrays["batch_idx"], arrays["batch_mask"]
    n_segments = len(bounds) - 1
    for s in range(seg_done, n_segments):
        p0, p1 = bounds[s], bounds[s + 1]
        if p1 == p0:
            continue
        B = bi.shape[-1]
        chunk_idx = bi[:, p0 * E:p1 * E].reshape(F_pad, p1 - p0, E, B)
        chunk_mask = bm[:, p0 * E:p1 * E].reshape(F_pad, p1 - p0, E, B)
        carry = segment_fn(carry, *data_args, chunk_idx, chunk_mask)
        if state_path and hyper.snapshot_every > 0:
            _save_carry(state_path, carry, s + 1)
        if _abort_after_segments is not None and s + 1 >= _abort_after_segments:
            raise SimulatedPreemption(f"aborted after segment {s + 1}")

    tail = ((bi[:, periods * E:], bm[:, periods * E:]) if rem > 0 else ())
    out = finalize_fn(carry, *data_args, *tail)
    if state_path and os.path.exists(state_path):
        os.remove(state_path)
    crop = lambda x: x[:G, :F]  # noqa: E731
    return GroupResult(
        group=group,
        best_metrics=np.asarray(out["metrics"])[:G, :F],
        best_probs=np.asarray(out["probs"])[:G, :F],
        best_params=jax.tree.map(crop, out["params"]),
        final_loss=np.asarray(out["loss"])[:G, :F],
    )


def sweep_hyper_from_args(args, balanced_weights: bool = True) -> SweepHyper:
    if getattr(args, "gradient_accumulation_steps", 1) > 1:
        logger.warning(
            "--gradient_accumulation_steps is not supported by the vmapped "
            "sweep engine and will be ignored; use the single-config path "
            "for accumulation.")
    return SweepHyper(
        num_steps=args.num_steps, eval_every=args.eval_every,
        train_batch_size=args.train_batch_size,
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, decay_type=args.decay_type,
        balanced_weights=balanced_weights, seed=args.seed,
        snapshot_every=getattr(args, "snapshot_every", 0),
        remat=getattr(args, "remat", False))


def sweep_aug_mode(args) -> str:
    """All three aug modes run through the pooled sweeps: 'disk' reads the
    precomputed folders, 'device' computes the same three variants on
    device at pool-build time (PoolBuilder.device_aug_row — no aug folders
    needed on disk), 'none' skips augmentation."""
    return args.aug_mode


def sweep_marker_path(state_dir: str, marker_prefix: str,
                      group: ConfigGroup, n_folds: int,
                      hyper: SweepHyper) -> str:
    """Resume-marker file for one group.  Keyed by the full run fingerprint
    (conf set + fold count + hyperparameters), not just the shape class — a
    (D,k)-only key would let --resume silently reuse a DIFFERENT config's
    or hyper setting's results.  snapshot_every is excluded: it is a purely
    operational knob (results are proven identical across cadences), and
    keying on it would make --resume with a changed cadence silently
    discard every completed group."""
    import hashlib
    import os

    # remat is excluded like snapshot_every: both are operational knobs
    # with results proven identical, and keying on them would orphan
    # completed-group markers across a setting change.
    hyper_key = dataclasses.replace(hyper, snapshot_every=0, remat=False)
    fp = hashlib.sha1(repr((group.confs, n_folds, hyper_key))
                      .encode()).hexdigest()[:12]
    return os.path.join(
        state_dir,
        f"{marker_prefix}_group_{group.hidden_size}_"
        f"{group.num_heads}_{fp}.json")


def run_grouped_baselines(args, data: FoldData, hyper: SweepHyper,
                          ckpt_kind: str, fold_label, fold_tag,
                          marker_prefix: str,
                          confs=range(1, 19), fold_ids=None,
                          n_folds_total=None) -> Dict:
    """The shared 18-config group loop: train each (hidden, heads) shape
    class as one vmapped program, write per-(conf, fold) checkpoints in the
    reference layout, persist per-group result markers (--resume skips
    completed groups after preemption), honor --profile_dir, and append
    per-conf events to the JSONL metrics log."""
    import json
    import os

    from vit3d_ensemble_tpu.checkpoint import baseline_ckpt_path, save_pytree
    from vit3d_ensemble_tpu.sweep.stack import unpad_group_params
    from vit3d_ensemble_tpu.utils.metrics_log import default_logger
    from vit3d_ensemble_tpu.utils.profiling import profile_to

    from vit3d_ensemble_tpu.parallel.mesh import mesh_from_spec

    mesh = mesh_from_spec(getattr(args, "mesh", None))
    if mesh is not None:
        logger.info("multi-chip sweep: mesh model=%d x data=%d over %s",
                    mesh.shape["model"], mesh.shape["data"],
                    mesh.devices.ravel()[0].platform)

    state_dir = os.path.join(args.output_dir, "sweep_state")
    os.makedirs(state_dir, exist_ok=True)
    mlog = default_logger(args.output_dir)

    results: Dict[int, Dict[str, Dict[str, float]]] = {}
    with profile_to(getattr(args, "profile_dir", None)):
        for group in group_configs(confs):
            marker = sweep_marker_path(state_dir, marker_prefix, group,
                                       data.n_folds, hyper)
            if getattr(args, "resume", False) and os.path.exists(marker):
                # elastic recovery: this group already completed in a
                # previous (possibly preempted) run — reload its results.
                with open(marker) as f:
                    saved = json.load(f)
                results.update({int(k): v for k, v in saved.items()})
                logger.info("resume: skipping completed group (D=%d, k=%d)",
                            group.hidden_size, group.num_heads)
                continue
            logger.info("training group (D=%d, k=%d): confs %s",
                        group.hidden_size, group.num_heads, group.confs)
            # mid-group state IS keyed by snapshot cadence and mesh shape:
            # segment boundaries and padded carry shapes differ across them,
            # so a stale-keyed state would restore garbage (restart instead).
            mesh_tag = ("1x1" if mesh is None else
                        f"{mesh.shape['model']}x{mesh.shape['data']}")
            state_path = (marker[:-len(".json")]
                          + f"_state_s{hyper.snapshot_every}"
                          + f"_m{mesh_tag}.msgpack")
            res = run_group(group, data, hyper, args.img_size, mesh=mesh,
                            state_path=state_path,
                            resume=getattr(args, "resume", False),
                            fold_ids=fold_ids,
                            n_folds_total=n_folds_total)
            members = unpad_group_params(res.best_params, group,
                                         args.img_size)
            group_results: Dict[int, Dict[str, Dict[str, float]]] = {}
            for g, conf in enumerate(group.confs):
                group_results[conf] = {}
                for f in range(data.n_folds):
                    m = res.metrics_dict(g, f)
                    group_results[conf][fold_label(f)] = m
                    ckpt = baseline_ckpt_path(args.output_dir, ckpt_kind,
                                              conf, fold_tag(conf, f))
                    save_pytree(ckpt, jax.tree.map(lambda x: x[f],
                                                   members[g]))
                    mlog.log("sweep_eval", conf=conf,
                             fold=fold_label(f), **m)
                logger.info("conf %d median AUROC over folds: %.4f", conf,
                            float(np.median(res.best_metrics[g, :, 3])))
            with open(marker, "w") as f:
                json.dump(group_results, f)
            results.update(group_results)
    return results


def run_cv_sweep(args) -> Dict[int, Dict[str, Dict[str, float]]]:
    """The full 18-config x num_cv CV sweep (the north-star workload).

    Drop-in for looping `train_baseline_cv.py` over all --config values.
    Returns {conf: {'CV 1': {metric: value}, ...}} and writes checkpoints
    in the reference layout.
    """
    from vit3d_ensemble_tpu.data.pool import build_pooled_cv

    hyper = sweep_hyper_from_args(args)
    pool, folds = build_pooled_cv(args.csv_path, args.data_root, args.num_cv,
                                  size=args.img_size,
                                  aug_mode=sweep_aug_mode(args))
    data = stack_folds(pool, folds, hyper)
    return run_grouped_baselines(
        args, data, hyper, ckpt_kind="cv_baseline",
        fold_label=lambda f: f"CV {f + 1}",
        fold_tag=lambda conf, f: f"cv{f + 1}",
        marker_prefix="cv")
