"""Pre-training engine: pjit data-parallel train loop with checkpoint/resume.

TPU-native replacement for the reference driver
(``/root/reference/src/stonkgs/models/stonkgs_pretraining.py:103-244``):
HF Trainer + accelerate + optional DeepSpeed ZeRO-2 becomes one jitted
train step over a {data, model} mesh — gradients are psum'd by XLA over
ICI, the KG table/decoders (and their optimizer moments) are sharded on
the model axis, and grad accumulation is a ``lax.scan`` inside the step.

Checkpoint/resume mirrors the reference behavior (save every
``save_steps``, keep ``save_total_limit``, auto-resume from the latest
checkpoint — ``stonkgs_pretraining.py:96,185-186,195-212``) using Orbax.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from stonkgs_tpu.config import STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.parallel.mesh import shard_batch, shard_params
from stonkgs_tpu.train.optimizer import make_optimizer

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("step", "params", "opt_state", "rng"),
    meta_fields=(),
)
@dataclasses.dataclass
class TrainState:
    """Train-step carry: step counter, params, optimizer state, PRNG key."""
    step: Array          # scalar int32
    params: dict
    opt_state: optax.OptState
    rng: Array

    def tree(self):
        return {"step": self.step, "params": self.params,
                "opt_state": self.opt_state, "rng": self.rng}


def init_train_state(
    params: dict, tx: optax.GradientTransformation, seed: int = 0
) -> TrainState:
    """Build the train state; optimizer state covers the TRAINABLE
    subtree only (frozen backbones carry no moments — see
    ``optimizer.split_frozen``)."""
    from stonkgs_tpu.train.optimizer import split_frozen

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(split_frozen(params)[0]),
        rng=jax.random.PRNGKey(seed),
    )


def resolve_train_impl(remat="auto", attention_impl="auto",
                       mesh: Optional[Mesh] = None):
    """Resolve "auto" training knobs to the measured-best configuration.

    On a single TPU chip, the Pallas custom-VJP flash attention with NO
    layer remat is the fastest full-scale configuration measured (PERF.md
    round 4: 182.4 examples/s/chip at batch 32 — the fused-FFN custom VJP
    already recomputes the FFN intermediates, and the flash VJP never
    stores S² buffers, so the no-remat residual footprint fits to at
    least batch 64); elsewhere the XLA attention with full-layer remat is
    the safe default.

    On a multi-device ``mesh``, "auto"/"flash" resolve to
    ``("flash", mesh)``: the Mosaic custom call has no GSPMD partitioning
    rule, so the kernel runs under ``shard_map`` over the data axis — each
    shard computes its local batch and the in-kernel dropout seed is
    folded with the shard index (``ops.attention._sharded_flash``;
    equivalence pinned in ``test_sharding_equivalence.py``).
    """
    on_tpu = jax.default_backend() == "tpu"
    single = mesh is None or mesh.size == 1
    if attention_impl in (None, "auto"):
        attention_impl = "flash" if on_tpu else "xla"
    if attention_impl == "flash" and not single:
        attention_impl = ("flash", mesh)
    is_flash = attention_impl == "flash" or isinstance(attention_impl, tuple)
    if remat in (None, "auto", True):
        # flash VJP + fused-FFN VJP leave no S²/FFN buffers to shed, so
        # remat would only add recompute (182.4 none vs 179.9 attention
        # ex/s at B=32).  remat="unroll" (static Python layer loop) was
        # measured same-session at the full step and is NOT faster —
        # 181.0 ex/s vs 185.5 none at B=32, with ~3x the compile time —
        # so auto stays none; see PERF.md round-5 trunk accounting.
        # Non-TPU paths keep the conservative full remat.
        remat = False if (is_flash and on_tpu) else "full"
    if remat == "none":
        remat = False
    return remat, attention_impl


def make_train_step(
    cfg: STonKGsConfig,
    tx: optax.GradientTransformation,
    *,
    loss_fn: Optional[Callable] = None,
    compute_dtype=jnp.bfloat16,
    grad_accumulation_steps: int = 1,
    remat: bool = False,
    attention_impl: str = "xla",
    mesh: Optional[Mesh] = None,
    donate: bool = True,
):
    """Build the jitted train step.

    The step consumes a batch with leading dim
    ``grad_accumulation_steps * micro_batch`` and scans over micro-batches,
    accumulating gradients in fp32 (reference equivalent:
    ``gradient_accumulation_steps`` in TrainingArguments).

    ``attention_impl="flash"`` uses the Pallas custom-VJP attention
    (``ops.flash_attention``): the O(S²) softmax residuals are recomputed
    in the backward kernel, so the trunk can train without remat.

    NOTE: ``remat``/``attention_impl`` are threaded into the DEFAULT
    STonKGs loss only — a custom ``loss_fn`` must carry its own (bake
    them in with ``functools.partial``).
    """
    if loss_fn is None:
        from stonkgs_tpu.parallel import tp

        loss_fn = partial(stonkgs.pretraining_loss, remat=remat,
                          attention_impl=attention_impl,
                          tp_mesh=mesh if tp.has_model_axis(mesh) else None)

    from stonkgs_tpu.train.optimizer import merge_frozen, split_frozen

    def micro_loss(train_params, frozen_params, batch, rng):
        loss, metrics = loss_fn(
            merge_frozen(train_params, frozen_params), cfg, batch,
            deterministic=False, dropout_rng=rng,
            compute_dtype=compute_dtype,
        )
        return loss, metrics

    # differentiate the TRAINABLE subtree only: frozen backbones (~190M
    # params at full scale) never get zero-gradient buffers, never pass
    # through the global-norm clip, and skip apply_updates — measured
    # ~8 GB/step of avoided HBM traffic (PERF.md)
    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, Array]):
        rng, step_rng = jax.random.split(state.rng)
        train_p, frozen_p = split_frozen(state.params)

        if grad_accumulation_steps == 1:
            (_, metrics), grads = grad_fn(train_p, frozen_p, batch, step_rng)
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(
                    (grad_accumulation_steps, -1) + x.shape[1:]
                ),
                batch,
            )
            rngs = jax.random.split(step_rng, grad_accumulation_steps)

            def body(acc, inp):
                g_acc, m_acc = acc
                mb, r = inp
                (_, m), g = grad_fn(train_p, frozen_p, mb, r)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                m_acc = jax.tree.map(jnp.add, m_acc, m)
                return (g_acc, m_acc), None

            # scan over ALL micro-batches from zero accumulators (the
            # metrics structure comes from eval_shape, which costs
            # nothing) — special-casing the first micro-batch outside the
            # scan kept an extra full fp32 gradient tree alive
            (_, m_shape), _ = jax.eval_shape(
                grad_fn, train_p, frozen_p,
                jax.tree.map(lambda x: x[0], micro), rngs[0])
            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), train_p
            )
            zero_m = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
            (grads, metrics), _ = jax.lax.scan(
                body, (zero_g, zero_m), (micro, rngs))
            inv = 1.0 / grad_accumulation_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            metrics = jax.tree.map(lambda m: m * inv, metrics)

        if getattr(tx, "use_fused_apply", False):
            # single-pass fused clip+AdamW+apply (optimizer.FusedClippedAdamW,
            # opt-in: time-neutral vs the chain but higher peak memory)
            new_train, opt_state = tx.update_and_apply(
                grads, state.opt_state, train_p)
        else:
            updates, opt_state = tx.update(grads, state.opt_state, train_p)
            new_train = optax.apply_updates(train_p, updates)
        params = merge_frozen(new_train, frozen_p)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    # Sharding propagates from the inputs: params arrive with their
    # {model}-axis shardings (shard_params) and batches with P("data");
    # XLA inserts the gradient psum over ICI.
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


@dataclasses.dataclass
class PretrainingConfig:
    """Run configuration (defaults = reference CLI defaults,
    ``stonkgs_pretraining.py:55-102``)."""

    learning_rate: float = 1e-4
    max_steps: int = 200
    warmup_steps: int = 0
    weight_decay: float = 0.0
    micro_batch_size: int = 8
    grad_accumulation_steps: int = 1
    save_steps: int = 5000
    save_total_limit: int = 5
    log_steps: int = 100
    seed: int = 0
    compute_dtype: str = "bfloat16"
    remat: bool = False
    attention_impl: str = "xla"
    # fully shard params/grads/optimizer over the data axis (ZeRO-3-style;
    # the reference's DeepSpeed config stops at stage 2)
    fsdp: bool = False
    # smallest leaf (elements) fsdp shards; None = mesh.FSDP_MIN_SIZE
    fsdp_min_size: Optional[int] = None
    # stop (cleanly) after this step while keeping the LR schedule pinned
    # to max_steps — bounded sessions / preemption drills; resume continues
    # to max_steps with the identical trajectory
    stop_at_step: Optional[int] = None

    @property
    def batch_size(self) -> int:
        return self.micro_batch_size * self.grad_accumulation_steps


class _EndOfStream(Exception):
    """Sentinel wrapping a finite iterator's exhaustion (PEP 479 safe)."""


def _prefetch_to_device(it, place, n_steps: int, depth: int = 3):
    """Yield ``n_steps`` device-placed batches, preparing them on a
    background thread so host gather + H2D transfer overlap the running
    step (worth ~10 ms/step on the measured input path).

    The producer checks a stop event on every (timed) queue put so an
    early consumer exit — step exception, watchdog RuntimeError,
    KeyboardInterrupt — releases the thread instead of leaking it with
    ``depth`` device-resident batches pinned."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def work():
        try:
            for _ in range(n_steps):
                try:
                    item = place(next(it))
                except StopIteration:
                    raise _EndOfStream("data iterator exhausted early")
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            while not stop.is_set():
                try:
                    q.put(e, timeout=0.2)
                    break
                except queue.Full:
                    continue

    threading.Thread(target=work, daemon=True).start()
    try:
        for _ in range(n_steps):
            item = q.get()
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def data_iterator(
    features: Dict[str, np.ndarray],
    batch_size: int,
    *,
    seed: int = 0,
    skip_steps: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffling epoch iterator over preprocessed feature arrays.

    ``skip_steps`` fast-forwards deterministically for checkpoint resume
    WITHOUT materializing the skipped batches: whole epochs advance by
    drawing (and discarding) the epoch permutation only."""
    n = len(features["input_ids"])
    if n < batch_size:
        raise ValueError(
            f"dataset has {n} examples < batch_size {batch_size}: the "
            f"epoch loop would never yield")
    rng = np.random.default_rng(seed)
    steps_per_epoch = max((n - batch_size) // batch_size + 1, 0)
    while skip_steps >= steps_per_epoch > 0:
        rng.permutation(n)
        skip_steps -= steps_per_epoch
    while True:
        perm = rng.permutation(n)
        start = skip_steps * batch_size
        skip_steps = 0
        for i in range(start, n - batch_size + 1, batch_size):
            idx = perm[i: i + batch_size]
            yield {k: v[idx] for k, v in features.items()}


def pretrain(
    cfg: STonKGsConfig,
    params: dict,
    features: Dict[str, np.ndarray],
    run_cfg: PretrainingConfig,
    *,
    mesh: Optional[Mesh] = None,
    checkpoint_dir: Optional[str] = None,
    log_fn: Optional[Callable[[int, dict], None]] = None,
    loss_fn: Optional[Callable] = None,
) -> TrainState:
    """Run the pre-training loop; resumes from the latest checkpoint if any.

    ``loss_fn`` defaults to the STonKGs MLM+ELM+NSP loss; pass
    ``protstonkgs.pretraining_loss`` for the tri-modality variant."""
    from stonkgs_tpu.train.checkpoint import CheckpointManager

    if mesh is not None:
        # pad + place params BEFORE optimizer init so moments match shapes
        # (and inherit the fsdp shardings — the ZeRO memory win)
        params = shard_params(params, mesh, fsdp=run_cfg.fsdp,
                              fsdp_min_size=run_cfg.fsdp_min_size)
    else:
        # the jitted step donates its state: copy so the CALLER's param
        # arrays survive the first update (shard_params already copies)
        params = jax.tree.map(jnp.array, params)
    tx = make_optimizer(
        params,
        learning_rate=run_cfg.learning_rate,
        total_steps=run_cfg.max_steps,
        warmup_steps=run_cfg.warmup_steps,
        weight_decay=run_cfg.weight_decay,
    )
    state = init_train_state(params, tx, run_cfg.seed)
    if mesh is not None:
        # scalars (step, rng, optimizer counts) must live on the same
        # device set as the sharded params
        from stonkgs_tpu.parallel.mesh import replicate_unsharded

        state = dataclasses.replace(
            state,
            step=replicate_unsharded(state.step, mesh),
            rng=replicate_unsharded(state.rng, mesh),
            opt_state=replicate_unsharded(state.opt_state, mesh),
        )

    ckpt = CheckpointManager(checkpoint_dir, run_cfg.save_total_limit) \
        if checkpoint_dir else None
    start_step = 0
    if ckpt is not None:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = restored
            start_step = int(state.step)

    remat, attention_impl = resolve_train_impl(
        run_cfg.remat, run_cfg.attention_impl, mesh)
    step_fn = make_train_step(
        cfg, tx,
        loss_fn=loss_fn,
        compute_dtype=getattr(jnp, run_cfg.compute_dtype),
        grad_accumulation_steps=run_cfg.grad_accumulation_steps,
        remat=remat,
        attention_impl=attention_impl,
        mesh=mesh,
    )

    # deterministic data order across resume: fast-forward without
    # materializing the skipped batches
    it = data_iterator(features, run_cfg.batch_size, seed=run_cfg.seed,
                       skip_steps=start_step)

    if mesh is not None and jax.process_count() > 1:
        # multi-process: every process runs the same deterministic global
        # iterator (same seed => same permutation) and materializes only
        # its own rows; the global jax.Array is assembled from the
        # process-local shards (the per-host input pipeline, SURVEY §2.2)
        from stonkgs_tpu.parallel import multihost

        local = multihost.host_local_slice(run_cfg.batch_size)

        def place(b):
            return multihost.global_batch(
                {k: v[local] for k, v in b.items()}, mesh)
    elif mesh is not None:
        def place(b):
            return shard_batch(b, mesh)
    else:
        place = jax.device_put  # one pytree transfer, not one per column
    batches = _prefetch_to_device(
        it, place, run_cfg.max_steps - start_step)

    t0 = time.perf_counter()
    steady_t0 = None  # set after step 1 so throughput excludes compile
    nan_streak = 0
    # log events fetch DEFERRED: the device->host copy is started at the
    # log step but consumed one log interval later, so the (tunnel) round
    # trip overlaps the running steps instead of stalling the dispatch
    # queue (~25 ms/fetch on the tunneled backend).  The non-finite-loss
    # watchdog consequently trips up to one extra interval late.
    pending = None  # (1-based step number, device metrics)

    def fetch_and_log(step_num, m_dev):
        nonlocal nan_streak
        # ONE device fetch for all metrics (per-key float() costs a full
        # host round trip each on the tunneled backend)
        vals = jax.device_get(m_dev)
        loss_val = float(vals["loss"])
        # failure detection: halt on a run of non-finite losses instead
        # of silently corrupting the parameters (SURVEY.md §5.3 — the
        # reference has no such guard)
        if not np.isfinite(loss_val):
            nan_streak += 1
            if nan_streak >= 3:
                raise FloatingPointError(
                    f"non-finite loss for {nan_streak} consecutive "
                    f"checks at step {step_num}; last checkpoint is "
                    f"recoverable from {checkpoint_dir}")
        else:
            nan_streak = 0
        if log_fn:
            m = {k: float(v) for k, v in vals.items()}
            m["elapsed_sec"] = time.perf_counter() - t0
            # steady-state throughput: exclude the first (compiling) step;
            # device_get above synced to this step's completion, so the
            # clock read here is consistent with step_num steps done
            steady_steps = step_num - 1 - start_step
            if steady_steps > 0 and steady_t0 is not None:
                m["examples_per_sec"] = (
                    run_cfg.batch_size * steady_steps
                    / (time.perf_counter() - steady_t0)
                )
            log_fn(step_num, m)

    for step in range(start_step, run_cfg.max_steps):
        batch = next(batches)
        state, metrics = step_fn(state, batch)
        if steady_t0 is None:
            jax.block_until_ready(metrics["loss"])
            steady_t0 = time.perf_counter()
        stopping = (run_cfg.stop_at_step is not None
                    and step + 1 >= run_cfg.stop_at_step)
        if ((step + 1) % run_cfg.log_steps == 0
                or step + 1 == run_cfg.max_steps or stopping):
            jax.tree.map(lambda x: x.copy_to_host_async(), metrics)
            if pending is not None:
                fetch_and_log(*pending)
            pending = (step + 1, metrics)
        if ckpt is not None and (
            (step + 1) % run_cfg.save_steps == 0
            or step + 1 == run_cfg.max_steps
            or stopping
        ):
            # flush the deferred metrics fetch FIRST: the non-finite-loss
            # watchdog must get its chance to raise before this save can
            # rotate out the last known-good checkpoint (the deferred
            # fetch otherwise trips up to one log interval late)
            if pending is not None:
                fetch_and_log(*pending)
                pending = None
            # mid-run saves overlap their finalization with training; the
            # final/stop save blocks so the files are durable on return
            final = step + 1 == run_cfg.max_steps or stopping
            ckpt.save(step + 1, state, blocking=final)
        if stopping:
            break
    if pending is not None:
        fetch_and_log(*pending)
    if ckpt is not None:
        ckpt.wait()
    return state
