"""Vmapped END-TO-END ensemble sweep: every (combination, fold) trained
simultaneously, backbones unfrozen.

The reference's flagship workload retrains the FULL ensemble (3 backbones +
meta head, Adam, 100 epochs) for every C(18,3) = 816 combination x 5 CV
folds (`/root/reference/train_ensemble_cv.py:56-85`) — 4080 sequential
trainings.  `cli/train_ensemble_cv.py:run_end_to_end` reproduces that loop
faithfully but dispatches one program per (combination, fold); this module
instead stacks combinations and folds on vmap axes, exactly like the
baseline sweep engine does for (config, fold):

  * members are padded to their (hidden, heads) class templates with
    runtime depth/width masks (exact — `pad_members_to_templates`), so one
    program serves every combination whose members come from the same
    CLASS MULTISET;
  * slots are canonically SORTED by class, which collapses the ordered
    class signatures from 27 to C(3+2,2) = 10 — the meta head's init rows
    are permuted with the members, so results equal the sequential mode's
    (a Linear head is permutation-equivariant in its inputs when its
    per-row init moves with them).  One stream-level caveat: flax folds
    dropout rngs by module path, and the sort renames member paths
    (conf 2 may run as transformer_0), so each member's dropout DRAWS
    differ from the sequential ordering — the same class of documented
    deviation as padded-width dropout (`pad_members_to_templates`), and
    exactness holds whenever dropout is off (tests/test_e2e_grid.py);
  * combinations are chunked to bound device memory (params + Adam moments
    + grads per instance), folds ride the inner vmap axis, and an optional
    Mesh('model', 'data') shards combination-chunks x folds across chips —
    the same sharding contract as the frozen sweep.

Per-fold step counts may differ (train-split sizes differ); shorter folds
are padded with fully-masked steps that are TRUE no-ops (params, Adam
state, and the dropout rng stream are all held — the guard the frozen
sweep established), so each fold's trajectory is identical to its
exact-shape sequential run.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit3d_ensemble_tpu.configs import ViTConfig, parameters_config
from vit3d_ensemble_tpu.data import EpochBatcher
from vit3d_ensemble_tpu.metrics.jax_metrics import compute_eval_metrics
from vit3d_ensemble_tpu.models import TransformerEnsemble
from vit3d_ensemble_tpu.sweep.engine import METRIC_KEYS, _metrics_vector
from vit3d_ensemble_tpu.train.ensemble_trainer import (
    crop_ensemble_params,
    init_ensemble,
    pad_members_to_templates,
)
from vit3d_ensemble_tpu.train.optim import adam
from vit3d_ensemble_tpu.train.selection import (
    device_best_init,
    device_consider,
    device_take_if,
)

logger = logging.getLogger(__name__)

#: Device-memory budget for one chunk's training state (params + Adam m/v
#: + grads, x folds).  The v5e has 16 GB HBM; the fold data (~0.4 GB),
#: activations, and compiler scratch take the rest.  Deliberately
#: conservative: an HBM OOM on this tunnel can CRASH the TPU worker
#: (observed; ~25 min recovery), so the backoff path is a last resort,
#: not a sizing strategy.
_CHUNK_STATE_BYTES = int(6 * 2**30)


def _conf_class(conf: int) -> Tuple[int, int]:
    """(hidden, heads) shape class of a baseline conf number."""
    _, _, _, hs, nh = parameters_config(conf)
    return (hs, nh)


@dataclasses.dataclass(frozen=True)
class ComboPlan:
    """One combination, canonically slot-sorted for program sharing."""

    confs: Tuple[int, ...]          # original ascending conf order
    sorted_confs: Tuple[int, ...]   # slot order actually run (by class)
    perm: Tuple[int, ...]           # slot j holds original slot perm[j]

    @property
    def name(self) -> str:
        return "_".join(str(c) for c in self.confs)


def plan_combo(confs: Sequence[int]) -> ComboPlan:
    confs = tuple(confs)
    order = sorted(range(len(confs)),
                   key=lambda i: (_conf_class(confs[i]), confs[i]))
    return ComboPlan(confs=confs,
                     sorted_confs=tuple(confs[i] for i in order),
                     perm=tuple(order))


def signature_of(plan: ComboPlan) -> Tuple[Tuple[int, int], ...]:
    return tuple(_conf_class(c) for c in plan.sorted_confs)


@dataclasses.dataclass
class E2EFoldData:
    """Fold-stacked splits, padded to common sizes (see engine.stack_folds;
    ensembles consume whole normalized splits, no shared pool).  The
    optional test split (the bootstrap driver's held-out set,
    `/root/reference/train_ensemble_bootstrap.py:224-254`) rides the same
    fold axis — the grid evaluates it at every best-accept, which equals
    evaluating the best checkpoint once."""

    vols: np.ndarray          # (F, N, H, W, Z, C) float32
    labels: np.ndarray        # (F, N) float32
    val_vols: np.ndarray      # (F, V, H, W, Z, C) float32
    val_labels: np.ndarray    # (F, V) float32
    val_mask: np.ndarray      # (F, V) float32
    idx_all: np.ndarray       # (F, E, S, B) int32
    msk_all: np.ndarray       # (F, E, S, B) float32
    val_sizes: Tuple[int, ...]
    test_vols: Optional[np.ndarray] = None    # (F, T, H, W, Z, C)
    test_sizes: Tuple[int, ...] = ()
    #: True when every fold has the same steps-per-epoch — then no step is
    #: ever fully masked and the per-step no-op guard (three whole-tree
    #: where() passes over params + Adam state, pure HBM bandwidth) is
    #: compiled out.  The reference CV folds are all 72 rows, so the real
    #: workload always takes the guard-free program.
    uniform_steps: bool = True

    @property
    def n_folds(self) -> int:
        return self.vols.shape[0]


def stack_e2e_folds(folds: Sequence[Tuple],
                    num_epochs: int, batch_size: int,
                    seed: int) -> E2EFoldData:
    """Pad per-fold splits to common shapes + the whole-run batch schedule.

    `folds` entries are (train, val) or (train, val, test) SplitArrays
    tuples.  Matches the sequential trainer exactly: each fold's schedule
    comes from its own `EpochBatcher(n_f, B, seed)`
    (`train/ensemble_trainer.py`); folds shorter than the longest get
    fully-masked no-op steps appended at each epoch's end.
    """
    F = len(folds)
    n_max = max(len(f[0]) for f in folds)
    v_max = max(len(f[1]) for f in folds)
    s_max = max(EpochBatcher(len(f[0]), batch_size, seed=seed)
                .steps_per_epoch for f in folds)
    shp = folds[0][0].volumes.shape[1:]
    with_test = len(folds[0]) > 2 and folds[0][2] is not None

    vols = np.zeros((F, n_max) + shp, np.float32)
    labels = np.zeros((F, n_max), np.float32)
    val_vols = np.zeros((F, v_max) + shp, np.float32)
    val_labels = np.zeros((F, v_max), np.float32)
    val_mask = np.zeros((F, v_max), np.float32)
    idx_all = np.zeros((F, num_epochs, s_max, batch_size), np.int32)
    msk_all = np.zeros((F, num_epochs, s_max, batch_size), np.float32)
    test_vols = None
    if with_test:
        t_max = max(len(f[2]) for f in folds)
        test_vols = np.zeros((F, t_max) + shp, np.float32)

    for f, fold in enumerate(folds):
        t, v = fold[0], fold[1]
        n, vn = len(t), len(v)
        vols[f, :n] = t.volumes
        labels[f, :n] = t.labels.astype(np.float32)
        val_vols[f, :vn] = v.volumes
        val_labels[f, :vn] = v.labels.astype(np.float32)
        val_mask[f, :vn] = 1.0
        if with_test:
            test_vols[f, :len(fold[2])] = fold[2].volumes
        batcher = EpochBatcher(n, batch_size, seed=seed)
        for e in range(num_epochs):
            for s, (idx, msk) in enumerate(batcher.epoch()):
                idx_all[f, e, s] = idx
                msk_all[f, e, s] = msk
    steps = {EpochBatcher(len(f[0]), batch_size, seed=seed).steps_per_epoch
             for f in folds}
    return E2EFoldData(vols, labels, val_vols, val_labels, val_mask,
                       idx_all, msk_all,
                       val_sizes=tuple(len(f[1]) for f in folds),
                       test_vols=test_vols,
                       test_sizes=(tuple(len(f[2]) for f in folds)
                                   if with_test else ()),
                       uniform_steps=len(steps) == 1)


#: Epochs per device dispatch.  One chunk's whole run as a single XLA
#: execution can exceed 10+ minutes of device time, which this tunnel's
#: worker does not survive (observed: "TPU worker process crashed" on a
#: chunk-4 x 5-fold x 100-epoch program; the same math dispatched in
#: epoch segments runs fine).  Segmenting costs nothing: the carry stays
#: on device between calls and the math is identical.
SEGMENT_EPOCHS = 10


def _grid_programs(sig_cfgs: Tuple[ViTConfig, ...], learning_rate: float,
                   keep_payload: bool, with_test: bool,
                   guarded: bool = True):
    """Cached program builder — the jitted closures trace whatever op
    impls are global at first call, so the cache key must include them
    (otherwise switching `set_default_attention_impl` mid-process would
    silently reuse stale-impl programs)."""
    from vit3d_ensemble_tpu.ops.attention import get_default_attention_impl
    from vit3d_ensemble_tpu.ops.mlp import get_default_mlp_impl
    from vit3d_ensemble_tpu.ops.pallas_attention_layer import _nb_block
    from vit3d_ensemble_tpu.ops.quant import get_default_quant_impl

    # _nb_block() joins the key because the layer kernel reads
    # VIT3D_ATTN_LAYER_NB at trace time: without it, flipping the env var
    # mid-process would silently reuse programs traced under the old
    # block size (same stale-program class as the impl knobs).  Ditto the
    # quant selector (the grid's deterministic eval would take it).
    return _grid_programs_cached(
        sig_cfgs, learning_rate, keep_payload, with_test, guarded,
        (get_default_attention_impl(), get_default_mlp_impl(),
         _nb_block(), get_default_quant_impl()))


@functools.lru_cache(maxsize=None)
def _grid_programs_cached(sig_cfgs: Tuple[ViTConfig, ...],
                          learning_rate: float, keep_payload: bool,
                          with_test: bool, guarded: bool,
                          _impls: Tuple[str, str, int]):
    """(combo, fold)-vmapped (init, segment, finalize) programs for one
    class signature.  Mirrors `train/ensemble_trainer._ensemble_run_fn`
    (same loss, Adam, eval cadence, selection rule) with three grid
    adaptations: masked eval (padded val rows), no-op padded steps, and a
    selection payload that carries only what the caller needs — the best
    params (fetching 4080 best ensembles is ~GBs over the device link, so
    opt-in via `keep_payload`) and/or the held-out test split's
    probabilities under the accepted params (`with_test`: recomputing them
    at every accept equals evaluating the best checkpoint once, without
    ever fetching it).  Training is segmented at epoch granularity so no
    single device execution runs long enough to trip the tunnel (see
    SEGMENT_EPOCHS).  Members run with remat (`jax.checkpoint` per
    encoder block): numerics-identical, and it stops the backward pass
    from streaming every layer's (tokens, 3072) saved intermediates
    through HBM — the training step's dominant cost at these shapes."""
    model = TransformerEnsemble(sig_cfgs, remat=True)
    tx = adam(learning_rate)
    n_slots = len(sig_cfgs)

    def bind(masks, vols, labels, val_vols, val_labels, val_mask,
             test_vols):
        mm = tuple((masks[i, 0], masks[i, 1]) for i in range(n_slots))

        def loss_fn(p, bv, bl, bm, drop_rng):
            probs = model.apply({"params": p}, bv, deterministic=False,
                                rngs={"dropout": drop_rng},
                                member_masks=mm).reshape(-1)
            pc = jnp.clip(probs, 1e-12, 1 - 1e-12)
            per = -(bl * jnp.log(pc) + (1 - bl) * jnp.log(1 - pc))
            return jnp.sum(per * bm) / jnp.maximum(jnp.sum(bm), 1.0)

        def one_step(carry, im):
            p, opt, rng = carry          # rng carried as raw key data
            idx, bm = im
            new_key, sub = jax.random.split(jax.random.wrap_key_data(rng))
            loss, grads = jax.value_and_grad(loss_fn)(
                p, vols[idx], labels[idx], bm, sub)
            updates, new_opt = tx.update(grads, opt, p)
            new_p = optax.apply_updates(p, updates)
            new_rng = jax.random.key_data(new_key)
            if not guarded:
                return (new_p, new_opt, new_rng), loss
            # fully-masked padding steps must be TRUE no-ops — params, Adam
            # moments/count, and the rng stream all hold, so each fold's
            # trajectory equals its exact-shape sequential run.  (Compiled
            # out when every fold shares one steps-per-epoch — the where()
            # passes over params + Adam state are pure HBM bandwidth.)
            has_valid = jnp.sum(bm) > 0
            take = lambda new, old: jax.tree.map(   # noqa: E731
                lambda a, c: jnp.where(has_valid, a, c), new, old)
            new_rng = jnp.where(has_valid, new_rng, rng)
            return (take(new_p, p), take(new_opt, opt), new_rng), loss

        def evaluate(p):
            probs = model.apply({"params": p}, val_vols,
                                deterministic=True,
                                member_masks=mm).reshape(-1)
            return _metrics_vector(
                compute_eval_metrics(probs, val_labels, val_mask)), probs

        def payload_of(p):
            pay = {}
            if keep_payload:
                pay["params"] = p
            if with_test:
                pay["test_probs"] = model.apply(
                    {"params": p}, test_vols, deterministic=True,
                    member_masks=mm).reshape(-1)
            return pay

        return one_step, evaluate, payload_of

    DATA = 7   # masks, vols, labels, val_vols, val_labels, val_mask, test

    def init_one(params, *args):
        data, (rng0,) = args[:DATA], args[DATA:]
        _, _, payload_of = bind(*data)
        return dict(params=params, opt=tx.init(params),
                    rng=jax.random.key_data(rng0),
                    best=device_best_init(11, data[3].shape[0],
                                          payload_of(params)))

    def segment_one(carry, *args):
        data, (idx_seg, msk_seg) = args[:DATA], args[DATA:]
        one_step, evaluate, payload_of = bind(*data)

        def epoch_body(ecarry, chunk):
            inner, best = ecarry
            inner, losses = jax.lax.scan(one_step, inner, chunk)
            mvec, probs = evaluate(inner[0])
            best = device_consider(best, mvec, probs, payload_of(inner[0]),
                                   jnp.bool_(False))
            return (inner, best), losses[-1]

        inner = (carry["params"], carry["opt"], carry["rng"])
        (inner, best), _ = jax.lax.scan(epoch_body, (inner, carry["best"]),
                                        (idx_seg, msk_seg))
        return dict(params=inner[0], opt=inner[1], rng=inner[2], best=best)

    def finalize_one(carry, *args):
        data = args[:DATA]
        _, evaluate, payload_of = bind(*data)
        mvec, probs = evaluate(carry["params"])
        best = device_take_if(carry["best"], mvec, probs,
                              payload_of(carry["params"]),
                              ~carry["best"]["found"])
        return dict(metrics=best["metrics"], probs=best["probs"],
                    payload=best["payload"])

    # inner vmap: folds; outer vmap: combinations.  rng is shared (the
    # sequential mode seeds every (combo, fold) run identically).
    # NO buffer donation on init (the params stack): donate_argnums on
    # this program crashed the TPU worker at real scale (observed,
    # 2026-08-17; fine on CPU).  The segment carry IS donated — it never
    # outlives the next call.
    # data arg axes: masks is per-combo; the fold-stacked arrays are
    # per-fold; the volume/test pools broadcast over combos.
    data_fold = (None, 0, 0, 0, 0, 0, 0)
    data_combo = (0,) + (None,) * 6

    def vmapped(fn, first_fold, extra_fold, extra_combo, donate=False):
        fold_axes = (first_fold,) + data_fold + extra_fold
        combo_axes = (0,) + data_combo + extra_combo
        out = jax.vmap(jax.vmap(fn, in_axes=fold_axes), in_axes=combo_axes)
        return jax.jit(out, donate_argnums=(0,) if donate else ())

    # init's params stack is per-combo only (vmap broadcasts the carry to
    # the fold axis); the carry thereafter is per-(combo, fold).
    init_fn = vmapped(init_one, None, (None,), (None,))
    segment_fn = vmapped(segment_one, 0, (0, 0), (None, None), donate=True)
    finalize_fn = vmapped(finalize_one, 0, (), (), donate=True)
    return init_fn, segment_fn, finalize_fn


def _member_padder(member_loader: Callable, pad_kwargs: Optional[dict]):
    """conf -> (template_cfg, padded host param tree, (layers, mlp) mask),
    cached per sweep — padding each of the 18 members once serves all 816
    combinations.  The cache is local to one `run_e2e_grid` call (a global
    one would leak members across different checkpoint directories)."""
    cache: Dict[int, Tuple] = {}

    def get(conf: int):
        if conf not in cache:
            cfg, params = member_loader(conf)
            tcfgs, padded, masks = pad_members_to_templates(
                [cfg], [params], **(pad_kwargs or {}))
            cache[conf] = (tcfgs[0], jax.device_get(padded[0]), masks[0])
        return cache[conf]

    return get


def _stack_trees(trees: Sequence[dict]):
    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def _auto_chunk(param_bytes_per_combo: int, n_folds: int,
                keep_payload: bool) -> int:
    # Measured on the v5e: with remat (members recompute activations in
    # the backward pass) one (combo, fold) training instance costs ~6x its
    # param bytes — params + Adam m/v in a double-buffered while carry —
    # plus grads/updates transients.  keep_payload adds the best-params
    # copy (also double-buffered).  run_e2e_grid halves the chunk and
    # retries on compile-time OOM, so this only needs to be a good first
    # guess.
    #
    # HARD CAP 9: the state budget scales with PARAM bytes only, so
    # small-hidden signatures get huge chunks while their ACTIVATION
    # footprint (eval forwards without remat + backward recompute windows,
    # ∝ chunk x folds) keeps growing.  Measured 2026-08-17: the
    # ((16,16),(16,16),(32,8)) signature auto-sized to chunk 15 and
    # deterministically CRASHED the TPU worker (runtime HBM OOM kills the
    # worker with no RESOURCE_EXHAUSTED to catch — 29 identical
    # crash-resume loops); every signature ran stably at chunks 7-9.
    copies = 8 if keep_payload else 6
    per_combo = param_bytes_per_combo * copies * n_folds
    return int(max(1, min(9, _CHUNK_STATE_BYTES // max(per_combo, 1))))


def run_e2e_grid(
    combos: Sequence[Sequence[int]],
    member_loader: Callable[[int], Tuple[ViTConfig, dict]],
    data: E2EFoldData,
    *,
    num_epochs: int = 100,
    learning_rate: float = 1e-4,
    seed: int = 42,
    mesh=None,
    chunk: int = 0,
    keep_payload: bool = False,
    fold_label: Callable[[int], str] = lambda f: f"CV {f + 1}",
    on_result: Optional[Callable] = None,
    pad_kwargs: Optional[dict] = None,
) -> Dict[str, Dict[str, Dict[str, float]]]:
    """Train every (combination, fold) cell; returns
    {combo_name: {fold_label: {metric: value}}}.

    `on_result(plan, results_for_combo, extras)` is called once per
    combination as its chunk completes — `extras` carries "params" (the
    per-fold best ensembles, ascending-conf layout; None unless
    `keep_payload`) and "test_probs" (per-fold held-out probabilities
    under the best params; None unless `data` has a test split).  The
    CLIs use it for resume markers, checkpoint writes, and the bootstrap
    driver's test metrics.  `chunk=0` sizes combination-chunks from the
    device-memory budget.  With `mesh`, chunks shard over 'model' and
    folds over 'data'.
    """
    from vit3d_ensemble_tpu.ops.mlp import (
        get_default_mlp_impl,
        set_default_mlp_impl,
    )

    # The fused Pallas MLP is pinned OFF here: under the grid's double
    # vmap + nested scans the Pallas path blows up TPU compilation
    # (compile-time HBM OOM at any chunk size, then a compiler subprocess
    # crash at chunk 1 — observed 2026-08-17), and XLA's fused FFN is
    # within ~1.3x anyway at these training shapes.  The global impl is
    # restored on exit; it also MUST NOT leak into the cached programs
    # (the jitted closures trace whatever impl is global at first call).
    prev_impl = get_default_mlp_impl()
    if prev_impl != "xla":
        logger.info("e2e grid: forcing mlp_impl=xla (fused kernel is "
                    "unsupported under the grid's vmap; was %s)", prev_impl)
        set_default_mlp_impl("xla")
    try:
        return _run_e2e_grid(combos, member_loader, data,
                             num_epochs=num_epochs,
                             learning_rate=learning_rate, seed=seed,
                             mesh=mesh, chunk=chunk,
                             keep_payload=keep_payload,
                             fold_label=fold_label, on_result=on_result,
                             pad_kwargs=pad_kwargs)
    finally:
        set_default_mlp_impl(prev_impl)


def _run_e2e_grid(
    combos, member_loader, data, *, num_epochs, learning_rate, seed, mesh,
    chunk, keep_payload, fold_label, on_result, pad_kwargs,
) -> Dict[str, Dict[str, Dict[str, float]]]:
    F = data.n_folds
    plans = [plan_combo(c) for c in combos]
    by_sig: Dict[Tuple, List[ComboPlan]] = {}
    for p in plans:
        by_sig.setdefault(signature_of(p), []).append(p)

    with_test = data.test_vols is not None
    fold_arrs = dict(
        vols=data.vols, labels=data.labels, val_vols=data.val_vols,
        val_labels=data.val_labels, val_mask=data.val_mask,
        test_vols=(data.test_vols if with_test else
                   np.zeros((F, 1) + data.vols.shape[2:], np.float32)),
        idx_all=data.idx_all, msk_all=data.msk_all)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vit3d_ensemble_tpu.sweep.engine import _rep_pad

        fd = mesh.shape["data"]
        F_pad = -(-F // fd) * fd
        fold_arrs = {k: _rep_pad(v, F_pad) for k, v in fold_arrs.items()}
        fold_sh = NamedSharding(mesh, P("data"))
        combo_sh = NamedSharding(mesh, P("model"))
        fold_arrs = {k: jax.device_put(v, fold_sh)
                     for k, v in fold_arrs.items()}
    else:
        F_pad = F
        fold_arrs = {k: jnp.asarray(v) for k, v in fold_arrs.items()}

    results: Dict[str, Dict[str, Dict[str, float]]] = {}
    padded_member = _member_padder(member_loader, pad_kwargs)
    for sig, sig_plans in by_sig.items():
        member_trees, member_masks = {}, {}
        for p in sig_plans:
            for c in p.sorted_confs:
                if c not in member_trees:
                    _, tree, msk = padded_member(c)
                    member_trees[c], member_masks[c] = tree, msk
        tcfg_by_class = {_conf_class(c): padded_member(c)[0]
                         for c in member_trees}
        sig_cfgs = tuple(tcfg_by_class[cls] for cls in sig)

        # template init (meta head weights; backbone slots get overwritten)
        _, template = init_ensemble(
            sig_cfgs, [member_trees[c] for c in sig_plans[0].sorted_confs],
            seed)
        template = jax.device_get(template)
        meta_kernel = template["meta"]["classifier"]["kernel"]  # (k, 1)
        param_bytes = sum(a.size * 4 for a in
                          jax.tree.leaves(template))
        csize = chunk or _auto_chunk(param_bytes, F_pad, keep_payload)
        if mesh is not None:
            # round DOWN to a 'model'-axis multiple: rounding up can nearly
            # double the per-chunk HBM footprint the budget was sized for,
            # and an HBM OOM can crash the TPU worker (see _CHUNK_STATE_BYTES)
            cm = mesh.shape["model"]
            csize = max(cm, (csize // cm) * cm)
        init_fn, segment_fn, finalize_fn = _grid_programs(
            sig_cfgs, float(learning_rate), keep_payload, with_test,
            guarded=not data.uniform_steps)
        logger.info("e2e grid: signature %s — %d combination(s), "
                    "chunk %d", sig, len(sig_plans), csize)

        lo = 0
        while lo < len(sig_plans):
            batch_plans = sig_plans[lo:lo + csize]
            # chunk-start line: the stall supervisor watches log mtime, and
            # a chunk is silent from here until its results land (compile +
            # train, up to ~10 min for a fresh signature program) — this
            # line resets the stall clock at each chunk boundary so only a
            # genuinely hung chunk trips it.
            logger.info("e2e grid: chunk start %s[%d:%d] of %d",
                        "_".join(f"{h}.{k}" for h, k in sig), lo,
                        lo + len(batch_plans), len(sig_plans))
            # Pad the tail chunk to the full csize whenever a csize-wide
            # program exists (or will) for this signature, so every chunk
            # reuses one compiled program — each distinct remainder width
            # would otherwise cost a fresh 1-3 min cold compile through the
            # tunnel.  A signature smaller than one chunk compiles exactly
            # once either way, so it runs unpadded (mesh still needs the
            # combo axis divisible by the 'model' axis).
            if len(batch_plans) % csize and len(sig_plans) > csize:
                pad_c = csize - len(batch_plans)
            elif mesh is not None and len(batch_plans) % mesh.shape["model"]:
                cm = mesh.shape["model"]
                pad_c = -(-len(batch_plans) // cm) * cm - len(batch_plans)
            else:
                pad_c = 0
            padded_plans = batch_plans + [batch_plans[0]] * pad_c
            stacked, masks = [], []
            for p in padded_plans:
                tree = dict(template)
                # the meta row assigned to each member MOVES with it under
                # the canonical slot sort — a Linear head is permutation-
                # equivariant, so results equal the sequential ordering.
                tree["meta"] = {"classifier": {
                    "kernel": meta_kernel[list(p.perm)],
                    "bias": template["meta"]["classifier"]["bias"]}}
                for j, c in enumerate(p.sorted_confs):
                    tree[f"transformer_{j}"] = member_trees[c]
                stacked.append(tree)
                masks.append([list(member_masks[c])
                              for c in p.sorted_confs])
            params = _stack_trees(stacked)
            masks = np.asarray(masks, np.int32)
            if mesh is not None:
                params = jax.tree.map(
                    lambda a: jax.device_put(a, combo_sh), params)
                masks = jax.device_put(masks, combo_sh)
            data_args = (masks, fold_arrs["vols"], fold_arrs["labels"],
                         fold_arrs["val_vols"], fold_arrs["val_labels"],
                         fold_arrs["val_mask"], fold_arrs["test_vols"])
            E = data.idx_all.shape[1]
            try:
                carry = init_fn(params, *data_args, jax.random.key(seed))
                for e0 in range(0, E, SEGMENT_EPOCHS):
                    e1 = min(E, e0 + SEGMENT_EPOCHS)
                    carry = segment_fn(carry, *data_args,
                                       fold_arrs["idx_all"][:, e0:e1],
                                       fold_arrs["msk_all"][:, e0:e1])
                out = finalize_fn(carry, *data_args)
            except Exception as exc:  # compile-time HBM OOM: back off
                msg = str(exc)
                floor = mesh.shape["model"] if mesh is not None else 1
                if ("RESOURCE_EXHAUSTED" not in msg
                        and "Ran out of memory" not in msg) or csize <= floor:
                    raise
                csize = max(1, csize // 2)
                if mesh is not None:
                    cm = mesh.shape["model"]
                    csize = max(cm, (csize // cm) * cm)
                logger.warning("chunk OOM'd; retrying signature %s with "
                               "chunk %d", sig, csize)
                continue
            lo += len(batch_plans)
            metrics = np.asarray(out["metrics"])[:, :F]      # (c, F, 11)
            pay = out["payload"]
            test_probs = (np.asarray(pay["test_probs"])[:, :F]
                          if with_test else None)
            for ci, p in enumerate(batch_plans):
                res = {fold_label(f):
                       {k: float(v) for k, v in zip(METRIC_KEYS,
                                                    metrics[ci, f])}
                       for f in range(F)}
                results[p.name] = res
                extras = {
                    "params": ([
                        _unpermute_ensemble(
                            jax.tree.map(lambda a: np.asarray(a[ci, f]),
                                         pay["params"]), p, member_loader)
                        for f in range(F)] if keep_payload else None),
                    "test_probs": ([
                        test_probs[ci, f, :data.test_sizes[f]]
                        for f in range(F)] if with_test else None),
                }
                if on_result is not None:
                    on_result(p, res, extras)
                logger.info("ensemble %s median AUROC %.4f", p.name,
                            float(np.median(metrics[ci, :, 3])))
    return results


def _unpermute_ensemble(params: dict, plan: ComboPlan,
                        member_loader: Callable) -> dict:
    """Restore ascending-conf slot order + true member shapes, so grid
    checkpoints are byte-layout-identical to the sequential mode's."""
    k = len(plan.confs)
    out = {"meta": {"classifier": {
        "kernel": np.empty_like(np.asarray(
            params["meta"]["classifier"]["kernel"])),
        "bias": np.asarray(params["meta"]["classifier"]["bias"])}}}
    for j in range(k):
        out[f"transformer_{plan.perm[j]}"] = params[f"transformer_{j}"]
        out["meta"]["classifier"]["kernel"][plan.perm[j]] = \
            np.asarray(params["meta"]["classifier"]["kernel"])[j]
    true_cfgs = [member_loader(c)[0] for c in plan.confs]
    return crop_ensemble_params(out, true_cfgs)
