"""Training loop — jitted SPMD train step over a device mesh.

Re-implements ``segmentation3d/core/seg_train.py:train(config_file)``
(≈L20-190; call stack SURVEY.md §3.1) with the reference's observable
behavior — save-dir lifecycle, seeding, importlib net lookup by
``cfg.net.name``, ``crop_size % max_stride == 0`` assertion, Adam(lr, betas),
loss selection by ``cfg.loss.name``, per-batch ``epoch/batch/loss/time`` log
lines + ``train_loss.csv``, checkpoint save every ``save_epochs`` epochs,
``epoch_idx = batch_idx * batchsize // len(dataset)``, optional debug dump of
input crops, resume from ``cfg.general.resume_epoch`` — but TPU-native
execution:

- ONE jitted ``train_step`` (fwd + loss + grad + Adam update + BN stats),
  donated buffers, batch sharded over a ``data`` mesh, params replicated;
  XLA inserts the gradient ``psum`` (replacing ``nn.DataParallel``);
- the data pipeline crops/normalizes on device (see ``dataloader.dataset``).
"""
from __future__ import annotations

import functools
import os
import queue as _queue
import shutil
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from segmentation3d_tpu.config import load_config
from segmentation3d_tpu.dataloader import SegmentationDataset, EpochConcateSampler
from segmentation3d_tpu.losses import create_loss
from segmentation3d_tpu.models import get_network_module
from segmentation3d_tpu.models.vnet import vnet_focal_init
from segmentation3d_tpu.parallel import make_mesh, make_global_batch, replicate
from segmentation3d_tpu.utils import model_io
from segmentation3d_tpu.utils.file_io import setup_logger


def _prepare_save_dir(save_dir: str, resume: bool, logger=None):
    """Reference behavior: a fresh (non-resume) run wipes the save dir."""
    if os.path.isdir(save_dir) and not resume:
        entries = set(os.listdir(save_dir))
        # everything a training run itself writes into save_dir — a fresh
        # re-run over a COMPLETED run (incl. validation artifacts) must wipe
        # and restart like the reference, not refuse
        known = {"checkpoints", "train_log.txt", "train_loss.csv", "debug",
                 "train_loss.png", "val_dice.csv", "val_dice.png"}
        if entries and not entries <= known:
            raise RuntimeError(
                f"refusing to wipe {save_dir}: contains non-checkpoint entries "
                f"{sorted(entries - known)}; remove it manually or resume")
        shutil.rmtree(save_dir)
    os.makedirs(save_dir, exist_ok=True)


class _BatchPrefetcher:
    """Assembles upcoming batches on a background thread (the TPU analog of
    the reference's DataLoader worker pool, ``num_threads`` -> depth): batch
    b+1 is cropped/normalized while the device runs step b.

    Multi-host: every process draws the SAME global index stream (the
    sampler is seeded identically on all hosts) but loads/crops only its
    own ``batchsize / process_count`` slice of each batch;
    ``make_global_batch`` stitches the local rows into the globally-sharded
    array, so no host reads cases another host's devices consume. The
    returned ``frames``/``names`` describe the LOCAL rows only."""

    def __init__(self, dataset, index_iter, batchsize, mesh, depth=2):
        self.dataset = dataset
        self.index_iter = index_iter
        self.batchsize = batchsize
        self.mesh = mesh
        self.pc = jax.process_count()
        self.pi = jax.process_index()
        assert batchsize % self.pc == 0
        self.local_rows = batchsize // self.pc
        self._stop = False
        self.q = _queue.Queue(maxsize=max(1, depth))
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        while not self._stop:
            try:
                idxs = [next(self.index_iter) for _ in range(self.batchsize)]
            except StopIteration:
                self.q.put(None)
                return
            local = idxs[self.pi * self.local_rows:
                         (self.pi + 1) * self.local_rows]
            try:
                batch = self.dataset.batch(local)
                images, segs = make_global_batch(
                    (batch[0], batch[1]), self.mesh, self.batchsize)
            except Exception as e:  # surface in the train loop, not a hang:
                # a dead prefetch thread would block q.get() forever
                self.q.put(e)
                return
            self.q.put((images, segs, batch[2], batch[3]))

    def stop(self):
        self._stop = True
        while not self.q.empty():
            try:
                self.q.get_nowait()
            except _queue.Empty:
                break

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, Exception):
            raise RuntimeError(f"batch assembly failed: {item}") from item
        return item


def _batch_spec(mesh, leading=0):
    """NamedSharding pinning a batch array's (batch, z) dims to the
    ``(data, spatial)`` mesh axes (``leading`` extra unsharded dims first);
    None when the mesh has no spatial axis (1-D data meshes need no
    constraint — placement propagates)."""
    if mesh is None or "spatial" not in mesh.axis_names:
        return None
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(
        mesh, PartitionSpec(*([None] * leading), "data", "spatial"))


def _make_step_body(net, loss_fn, apply_fn, packed_loss, optimizer,
                    mesh=None):
    """The un-jitted single-step body shared by the one-step and the
    multi-step (scan) programs."""
    apply = apply_fn if apply_fn is not None else net.apply
    loss_call = packed_loss if packed_loss is not None else loss_fn
    spec = _batch_spec(mesh)

    def body(params, batch_stats, opt_state, images, segs):
        if spec is not None:
            # spatial training shard (cfg.tpu.mesh.spatial): the crop
            # z-axis rides the 'spatial' mesh axis — GSPMD partitions every
            # conv with halo exchanges and psums the BN/loss reductions, so
            # no chip holds the full crop's activations
            images = jax.lax.with_sharding_constraint(images, spec)
            segs = jax.lax.with_sharding_constraint(segs, spec)

        def loss_of(p):
            probs, mutated = apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"])
            return loss_call(probs, segs), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss

    return body


def make_train_step(net, loss_fn, optimizer, apply_fn=None, packed_loss=None,
                    mesh=None):
    """Build the jitted SPMD train step (donated params/opt/batch-stats).

    ``apply_fn``: optional replacement for ``net.apply`` with the same
    calling convention (e.g. the packed-domain training forward,
    ``models.packed_train.build_packed_train_apply``). ``packed_loss``:
    optional ``fn(prob_packed, segs)`` used INSTEAD of ``loss_fn`` when
    ``apply_fn`` emits packed-layout probabilities
    (``build_packed_train_apply(net, packed_probs=True)`` +
    ``losses.packed.make_packed_loss`` — same scalar, no thin-channel
    unpacked tensors in the loss). ``mesh``: a 2-D ``(data, spatial)``
    mesh constrains the crop z-axis onto ``spatial`` (see
    :func:`segmentation3d_tpu.parallel.make_mesh`)."""
    body = _make_step_body(net, loss_fn, apply_fn, packed_loss, optimizer,
                           mesh=mesh)
    return functools.partial(jax.jit, donate_argnums=(0, 1, 2))(body)


def make_accum_train_step(net, loss_fn, optimizer, accum, apply_fn=None,
                          packed_loss=None, mesh=None):
    """One optimizer step over ``accum`` sequential microbatches, fused into
    ONE jitted program (``cfg.train.grad_accum_steps`` — an ADDITIVE option;
    the reference has no accumulation, SURVEY C10 ≈L140-145).

    The incoming batch ``[B, ...]`` is split into ``accum`` microbatches of
    ``B // accum`` rows; gradients are summed across them at the OUTER
    parameters and averaged before a single Adam update — exactly the mean
    gradient over the full batch, at ``1/accum`` of the activation memory
    (only one microbatch's forward is live at a time in the scan).

    BatchNorm semantics match torch-style gradient accumulation: each
    microbatch normalizes by its OWN statistics and the running stats thread
    sequentially through the scan — i.e. equivalent to ``accum`` small-batch
    forwards, not to one large-batch forward. The returned loss is the mean
    of the microbatch losses."""
    body_apply = apply_fn if apply_fn is not None else net.apply
    loss_call = packed_loss if packed_loss is not None else loss_fn

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, images, segs):
        b = images.shape[0]
        assert b % accum == 0, (b, accum)
        mb = b // accum
        im = images.reshape((accum, mb) + images.shape[1:])
        sg = segs.reshape((accum, mb) + segs.shape[1:])
        if mesh is not None and mesh.devices.size > 1:
            # pin the microbatch axis (dim 1) to the data mesh (and crop z
            # to 'spatial' when present): without the constraint GSPMD may
            # propagate the incoming batch's sharding onto the scanned
            # accum axis (dim 0), inserting resharding collectives per
            # microbatch
            s = _batch_spec(mesh, leading=1)
            if s is None:
                from jax.sharding import NamedSharding, PartitionSpec
                s = NamedSharding(mesh, PartitionSpec(None, "data"))
            im = jax.lax.with_sharding_constraint(im, s)
            sg = jax.lax.with_sharding_constraint(sg, s)

        def loss_of(p, bs, x, y):
            probs, mutated = body_apply(
                {"params": p, "batch_stats": bs}, x,
                train=True, mutable=["batch_stats"])
            return loss_call(probs, y), mutated["batch_stats"]

        def scan_body(carry, xs):
            bs, gsum, lsum = carry
            x, y = xs
            (loss, nbs), g = jax.value_and_grad(
                loss_of, has_aux=True)(params, bs, x, y)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            return (nbs, gsum, lsum + loss), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (new_stats, gsum, lsum), _ = jax.lax.scan(
            scan_body, (batch_stats, zeros, jnp.zeros((), jnp.float32)),
            (im, sg))
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, lsum / accum

    return step


def make_multi_train_step(net, loss_fn, optimizer, k, apply_fn=None,
                          packed_loss=None, mesh=None):
    """``k`` sequential train steps fused into ONE jitted program
    (``lax.scan`` over the single-step body; batch stacking happens INSIDE
    the jit so one dispatch covers the whole group).

    Why: on the axon relay every program dispatch costs ~20-25 ms of host
    latency (CLAUDE.md); the profiled 96^3/batch-8 step is 108.9 ms of
    device time vs ~131 ms of wall — per-step dispatch is the residual.
    Semantics are EXACTLY ``k`` sequential steps: params/BN stats/optimizer
    state thread through the scan carry; returns the per-step losses
    ``[k]``. Call as ``multi_step(params, stats, opt, *images_k, *segs_k)``
    with ``k`` image and ``k`` seg batches."""
    body = _make_step_body(net, loss_fn, apply_fn, packed_loss, optimizer,
                           mesh=mesh)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def multi_step(params, batch_stats, opt_state, *flat):
        assert len(flat) == 2 * k
        images = jnp.stack(flat[:k])
        segs = jnp.stack(flat[k:])

        def scan_body(carry, xs):
            p, bs, o = carry
            im, sg = xs
            np_, nbs, no, loss = body(p, bs, o, im, sg)
            return (np_, nbs, no), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            scan_body, (params, batch_stats, opt_state), (images, segs))
        return params, batch_stats, opt_state, losses

    return multi_step


def _group_len(batch_idx, k, total_batches, batchsize, dataset_len,
               prev_epoch, save_epochs, last_saved_epoch):
    """How many of the next ``k`` batches can run in one dispatch without
    crossing a checkpoint/validation boundary (a save may fire only after
    the LAST batch of a group — this mirrors the per-batch fire condition
    of the train loop exactly)."""
    k = min(k, total_batches - batch_idx)
    pe = prev_epoch
    for j in range(k):
        e = ((batch_idx + j) * batchsize) // dataset_len
        if e != pe and e % save_epochs == 0 and e != last_saved_epoch:
            return j + 1
        pe = e
    return max(k, 1)


def train(config_file: str):
    cfg = load_config(config_file)
    from segmentation3d_tpu.parallel.distributed import is_primary, barrier
    primary = is_primary()

    save_dir = cfg.general.save_dir
    resume_epoch = int(cfg.general.resume_epoch)
    resume = resume_epoch >= 0
    if primary:  # one process owns the save-dir lifecycle and all file logs
        _prepare_save_dir(save_dir, resume)
    barrier("save_dir_ready")
    logger = setup_logger(os.path.join(save_dir, "train_log.txt"),
                          to_file=primary)

    seed = int(cfg.general.seed)
    rng = jax.random.PRNGKey(seed)
    np.random.seed(seed)

    # debug/observability knobs (TPU-native additions; all default off)
    if cfg.debug.get("debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    profile_dir = cfg.debug.get("profile_dir", None)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    dataset = SegmentationDataset(
        imseg_list=cfg.general.imseg_list,
        num_classes=cfg.dataset.num_classes,
        spacing=cfg.dataset.spacing,
        crop_size=cfg.dataset.crop_size,
        sampling_method=cfg.dataset.sampling_method,
        random_translation=cfg.dataset.random_translation,
        interpolation=cfg.dataset.interpolation,
        crop_normalizers=cfg.dataset.crop_normalizers,
        random_flip=bool(cfg.dataset.get("random_flip", False)),
        # ADDITIVE augmentations (the reference has flip only); see
        # dataloader.dataset for semantics — all run on device
        random_rot90=bool(cfg.dataset.get("random_rot90", False)),
        random_intensity_scale=cfg.dataset.get("random_intensity_scale",
                                               None),
        random_intensity_shift=cfg.dataset.get("random_intensity_shift",
                                               None),
        random_noise_std=float(cfg.dataset.get("random_noise_std", 0.0)),
        random_elastic_magnitude=float(
            cfg.dataset.get("random_elastic_magnitude", 0.0)),
        random_elastic_grid=int(cfg.dataset.get("random_elastic_grid", 4)),
        random_elastic_prob=float(
            cfg.dataset.get("random_elastic_prob", 1.0)),
        seed=seed,
    )
    batchsize = int(cfg.train.batchsize)
    epochs = int(cfg.train.epochs)
    sampler = EpochConcateSampler(len(dataset), epochs, seed=seed)

    net_mod = get_network_module(cfg.net.name)
    max_stride = net_mod.max_stride()
    crop_size = np.asarray(cfg.dataset.crop_size, np.int64)
    assert np.all(crop_size % max_stride == 0), (
        f"crop_size {crop_size.tolist()} must be divisible by max_stride {max_stride}")

    dtype = jnp.bfloat16 if cfg.get("tpu", {}).get("dtype", "float32") == "bfloat16" \
        else jnp.float32
    # conv lowering backend. 'direct'/'window' select Conv3d's per-conv
    # lowering; 'packed_domain' keeps the WHOLE training forward in the
    # packed channels-minor form (models.packed_train — the fastest measured
    # backend) and is applied below as a train-step apply_fn, with the flax
    # module itself built 'direct' (identical parameter tree).
    conv_backend = str(cfg.get("tpu", {}).get("conv_backend", "direct"))
    if conv_backend not in ("direct", "window", "packed_domain"):
        raise ValueError(
            f"cfg.tpu.conv_backend {conv_backend!r} is not one of "
            "'direct', 'window', 'packed_domain'")
    if conv_backend == "packed_domain":
        from segmentation3d_tpu.models.packed_vnet import _p_for
        p0 = _p_for(int(cfg.net.get("base_channels", 16)))
        if int(crop_size[0]) % p0 != 0:
            raise ValueError(
                f"conv_backend 'packed_domain' requires crop width "
                f"(crop_size x = {int(crop_size[0])}) % {p0} == 0 (the "
                f"in_block packing); use 'window' otherwise")
    # optional architecture hyper-params from cfg.net (recorded in checkpoints
    # so inference rebuilds the exact same net)
    net_kwargs = {k: cfg.net[k] for k in
                  ("base_channels", "act", "bottleneck", "down_convs", "up_convs")
                  if k in cfg.net}
    net = net_mod.SegmentationNet(
        in_channels=dataset.num_modality,
        out_channels=int(cfg.dataset.num_classes),
        dtype=dtype,
        remat=bool(cfg.get("tpu", {}).get("remat", True)),
        conv_backend="direct" if conv_backend == "packed_domain" else conv_backend,
        **net_kwargs,
    )

    # init params on the example crop shape ([B,D,H,W,C], zyx order of crop)
    example = jnp.zeros((1, int(crop_size[2]), int(crop_size[1]), int(crop_size[0]),
                         dataset.num_modality), jnp.float32)
    variables = net.init(rng, example, train=False)
    if cfg.loss.name == "Focal":
        variables = vnet_focal_init(variables, obj_p=0.01)

    # constant-LR Adam is the reference behavior (SURVEY C10: "Adam(lr,
    # betas)", no scheduler exists there); cfg.train.lr_scheduler is an
    # ADDITIVE TPU-side option: {"name": "cosine"|"step"|"linear", ...}
    lr = float(cfg.train.lr)
    sched_cfg = cfg.train.get("lr_scheduler", None)
    if sched_cfg:
        total_steps = max(1, (len(dataset) * epochs) // batchsize)
        kind = str(sched_cfg.get("name", "cosine")).lower()
        if kind == "cosine":
            lr = optax.cosine_decay_schedule(
                lr, decay_steps=total_steps,
                alpha=float(sched_cfg.get("alpha", 0.0)))
        elif kind == "linear":
            lr = optax.linear_schedule(
                lr, float(sched_cfg.get("end_lr", 0.0)), total_steps)
        elif kind == "step":
            every = int(sched_cfg.get("step_epochs", 10))
            steps_per_epoch = max(1, len(dataset) // batchsize)
            lr = optax.exponential_decay(
                lr, transition_steps=every * steps_per_epoch,
                decay_rate=float(sched_cfg.get("gamma", 0.1)),
                staircase=True)
        else:
            raise ValueError(f"unknown lr_scheduler {kind}")
    # cfg.train.optimizer (ADDITIVE; default 'adam' = the reference's only
    # optimizer): 'sgd' exists for momentum-free runs and for exactness
    # testing — an SGD step's parameter delta IS the mean gradient, so
    # cross-topology equivalence can be asserted at float precision.
    opt_name = str(cfg.train.get("optimizer", "adam")).lower()
    if opt_name == "adam":
        optimizer = optax.adam(lr, b1=float(cfg.train.betas[0]),
                               b2=float(cfg.train.betas[1]))
    elif opt_name == "sgd":
        optimizer = optax.sgd(lr,
                              momentum=float(cfg.train.get("momentum", 0))
                              or None)
    else:
        raise ValueError(f"unknown cfg.train.optimizer {opt_name!r} "
                         "(supported: 'adam', 'sgd')")
    opt_state = optimizer.init(variables["params"])

    start_batch_idx = 0
    if resume:
        chk = model_io.checkpoint_dir(save_dir, resume_epoch)
        variables, payload = model_io.load_checkpoint(chk)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        saved_opt = model_io.load_opt_state(chk)
        if saved_opt is not None:
            opt_state = jax.tree_util.tree_map(jnp.asarray, saved_opt)
        start_batch_idx = int(payload.get("batch_idx", 0)) + 1
        logger.info(f"resumed from {chk} (epoch {resume_epoch})")

    # mesh: cfg.tpu.mesh.data wins if set; else cfg.general.num_gpus maps onto
    # the data-parallel mesh size (reference configs scale unmodified).
    # cfg.tpu.mesh.spatial = S > 1 (ADDITIVE) additionally shards the crop
    # z-axis S-ways over a 2-D (data, spatial) mesh — GSPMD halo-exchanges
    # the convs and psums the BN/loss reductions, so crops whose activations
    # OOM one chip train across the mesh (the training analog of
    # core.spatial_shard's inference mode).
    mesh_cfg = cfg.get("tpu", {}).get("mesh", {})
    spatial = max(1, int(mesh_cfg.get("spatial", 1) or 1))
    data_size = int(mesh_cfg.get("data", 0)) \
        or int(cfg.general.get("num_gpus", -1) or -1)
    mesh = make_mesh(data_size * spatial if data_size > 0 else -1,
                     spatial=spatial)
    if spatial > 1:
        if conv_backend == "packed_domain":
            raise ValueError(
                "cfg.tpu.mesh.spatial > 1 requires conv_backend 'direct' or "
                "'window' (the packed-domain forward's channel-minor "
                "reshapes do not GSPMD-partition along z)")
        if int(crop_size[2]) % (spatial * max_stride) != 0:
            raise ValueError(
                f"crop_size z = {int(crop_size[2])} must divide by "
                f"spatial mesh {spatial} * max_stride {max_stride} so every "
                "resolution level shards evenly")
    n_dev = mesh.devices.size
    n_data = mesh.shape["data"]
    if batchsize % n_data != 0 and n_data > 1:
        raise ValueError(f"batchsize {batchsize} must divide over the "
                         f"data mesh axis ({n_data})")
    if batchsize % jax.process_count() != 0:
        raise ValueError(f"batchsize {batchsize} must divide over "
                         f"{jax.process_count()} processes")
    params = replicate(variables["params"], mesh)
    batch_stats = replicate(variables["batch_stats"], mesh)
    loss_fn = create_loss(cfg.loss, int(cfg.dataset.num_classes))
    opt_state = replicate(opt_state, mesh)
    apply_fn, packed_loss = None, None
    if conv_backend == "packed_domain":
        from segmentation3d_tpu.models.packed_train import build_packed_train_apply
        from segmentation3d_tpu.losses.packed import make_packed_loss
        nc = int(cfg.dataset.num_classes)
        # P=None: inferred from the head output's shape, matching the
        # forward's W-adaptive head packing
        packed_loss = make_packed_loss(loss_fn, None, nc)
        apply_fn = build_packed_train_apply(
            net, packed_probs=packed_loss is not None)
    # cfg.train.grad_accum_steps = A > 1 (ADDITIVE): split each batch into A
    # microbatches inside one jitted step — mean-gradient-equivalent to the
    # full batch at 1/A the activation memory (for crops too large to fit
    # batchsize activations in HBM). BN normalizes per microbatch.
    grad_accum = max(1, int(cfg.train.get("grad_accum_steps", 1)))
    if grad_accum > 1:
        if batchsize % grad_accum != 0:
            raise ValueError(f"batchsize {batchsize} must divide by "
                             f"grad_accum_steps {grad_accum}")
        micro = batchsize // grad_accum
        if n_data > 1 and micro % n_data != 0:
            raise ValueError(
                f"microbatch {micro} (batchsize {batchsize} / "
                f"grad_accum_steps {grad_accum}) must divide over the "
                f"data mesh axis ({n_data})")
        train_step = make_accum_train_step(
            net, loss_fn, optimizer, grad_accum, apply_fn=apply_fn,
            packed_loss=packed_loss, mesh=mesh)
    else:
        train_step = make_train_step(net, loss_fn, optimizer,
                                     apply_fn=apply_fn,
                                     packed_loss=packed_loss, mesh=mesh)
    # cfg.tpu.steps_per_dispatch = K > 1 fuses K train steps into one
    # program (make_multi_train_step): one ~20 ms relay dispatch per K
    # steps instead of per step. Semantics identical (scan carry); groups
    # clamp at save/validate boundaries (single steps there), and debug
    # input dumps force K=1 (they need per-batch host data).
    steps_per_dispatch = max(
        1, int(cfg.get("tpu", {}).get("steps_per_dispatch", 1)))
    if cfg.debug.get("save_inputs", False):
        # forced BEFORE the clash check: save_inputs debugging on top of an
        # existing steps_per_dispatch setting runs at K=1 rather than erroring
        steps_per_dispatch = 1
    if steps_per_dispatch > 1 and grad_accum > 1:
        raise ValueError("cfg.tpu.steps_per_dispatch > 1 and "
                         "cfg.train.grad_accum_steps > 1 cannot be combined")
    multi_step = None
    if steps_per_dispatch > 1:
        multi_step = make_multi_train_step(
            net, loss_fn, optimizer, steps_per_dispatch, apply_fn=apply_fn,
            packed_loss=packed_loss, mesh=mesh)

    loss_csv = os.path.join(save_dir, "train_loss.csv")
    if primary and not os.path.isfile(loss_csv):
        with open(loss_csv, "w") as f:
            f.write("epoch,batch,loss\n")

    def save(epoch_idx, batch_idx):
        # multi-host: exactly one process writes (params are replicated so
        # every host holds the same values); a barrier keeps the others
        # from racing past the save point. Both degrade to no-ops on a
        # single host.
        if primary:
            variables_now = {
                "params": jax.device_get(params),
                "batch_stats": jax.device_get(batch_stats),
            }
            model_io.save_checkpoint(
                save_dir, epoch_idx, batch_idx, variables_now,
                net_name=cfg.net.name, max_stride=max_stride,
                in_channels=dataset.num_modality,
                out_channels=int(cfg.dataset.num_classes),
                spacing=cfg.dataset.spacing,
                interpolation=cfg.dataset.interpolation,
                crop_normalizers=cfg.dataset.crop_normalizers,
                config_file=config_file,
                opt_state=jax.device_get(opt_state),
                extra={"net_kwargs": dict(net_kwargs)} if net_kwargs else None,
            )
            logger.info(f"saved checkpoint chk_{epoch_idx}")
            # cfg.train.keep_checkpoints = N (ADDITIVE; default keep all,
            # the reference behavior): retain only the newest N numeric
            # checkpoints; chk_best is never pruned
            for d in model_io.prune_checkpoints(
                    save_dir, int(cfg.train.get("keep_checkpoints", 0))):
                logger.info(f"pruned old checkpoint {os.path.basename(d)}")
        barrier(f"chk_{epoch_idx}")

    # optional in-training validation (ADDITIVE — the reference logs train
    # loss only, SURVEY C10): cfg.train.val_list is a train-format txt of
    # held-out (image(s), seg) cases; at every save point the current
    # params run whole-volume inference on them and the mean foreground
    # Dice is logged / appended to val_dice.csv.
    val_list = cfg.train.get("val_list", None)
    val_csv = os.path.join(save_dir, "val_dice.csv")
    val_inferers = {}  # one compiled program per shape bucket, run-lifetime
    num_classes = int(cfg.dataset.num_classes)
    # best-validation checkpoint (ADDITIVE): every improvement of the mean
    # val Dice rewrites <save_dir>/checkpoints/chk_best (invisible to the
    # numeric latest-checkpoint scan; selected at inference with
    # ``seg_infer --checkpoint best``)
    save_best = bool(cfg.train.get("save_best", False))
    if save_best and not val_list:
        raise ValueError("cfg.train.save_best requires cfg.train.val_list")
    best_dice = [-1.0]
    if save_best and resume:
        best_chk = os.path.join(save_dir, "checkpoints", "chk_best")
        if os.path.isfile(os.path.join(best_chk, "params.pth")):
            prev = model_io.load_checkpoint_payload(best_chk)
            best_dice[0] = float(prev.get("val_dice", -1.0))

    def validate(epoch_idx, batch_idx):
        if not val_list or not primary:
            return
        from segmentation3d_tpu.core.validation import validate_cases
        # params live on the (possibly multi-host) mesh; validation is a
        # primary-local computation, so pull the replicated values to host
        host_vars = {"params": jax.device_get(params),
                     "batch_stats": jax.device_get(batch_stats)}
        mean_dice, per_class, n = validate_cases(
            net, host_vars, val_list,
            spacing=cfg.dataset.spacing,
            interpolation=cfg.dataset.interpolation,
            normalizers=cfg.dataset.crop_normalizers,
            num_classes=num_classes, max_stride=max_stride,
            shape_bucket=int(cfg.train.get("val_shape_bucket", 32)),
            size_cap=int(cfg.train.get("val_size_cap", 256)),
            slab_z=int(cfg.train.get("val_slab_z", 64)),
            inferer_cache=val_inferers,
            case_cache_gb=float(cfg.train.get("val_cache_gb", 2.0)))
        detail = ", ".join(f"c{c + 1}: {d:.4f}" for c, d in enumerate(per_class))
        logger.info(f"epoch: {epoch_idx}, val dice: {mean_dice:.4f} "
                    f"({n} cases{'; ' + detail if len(per_class) > 1 else ''})")
        header = not os.path.isfile(val_csv)
        with open(val_csv, "a") as f:
            if header:
                cols = ",".join(f"dice_c{c + 1}" for c in range(len(per_class)))
                f.write(f"epoch,val_dice{',' + cols if cols else ''}\n")
            vals = ",".join(f"{d}" for d in per_class)
            f.write(f"{epoch_idx},{mean_dice}{',' + vals if vals else ''}\n")
        if save_best and mean_dice > best_dice[0]:
            best_dice[0] = mean_dice
            model_io.save_checkpoint(
                save_dir, epoch_idx, batch_idx,
                {"params": host_vars["params"],
                 "batch_stats": host_vars["batch_stats"]},
                net_name=cfg.net.name, max_stride=max_stride,
                in_channels=dataset.num_modality,
                out_channels=num_classes,
                spacing=cfg.dataset.spacing,
                interpolation=cfg.dataset.interpolation,
                crop_normalizers=cfg.dataset.crop_normalizers,
                config_file=config_file,
                extra={"val_dice": float(mean_dice),
                       **({"net_kwargs": dict(net_kwargs)} if net_kwargs
                          else {})},
                dir_name="chk_best")
            logger.info(f"saved chk_best (val dice {mean_dice:.4f}, "
                        f"epoch {epoch_idx})")

    save_epochs = int(cfg.train.save_epochs)
    dataset_len = len(dataset)
    indices = iter(sampler)
    last_saved_epoch = resume_epoch if resume else -1
    prev_epoch = (start_batch_idx * batchsize) // dataset_len if resume else 0

    batch_idx = start_batch_idx
    total_batches = (dataset_len * epochs) // batchsize
    logger.info(f"training: {dataset_len} cases, {epochs} epochs, batch {batchsize}, "
                f"{n_dev} device(s), net {cfg.net.name}, loss {cfg.loss.name}")
    prefetch_depth = max(1, int(cfg.train.get("num_threads", 1)),
                         steps_per_dispatch + 1)
    prefetcher = _BatchPrefetcher(dataset, indices, batchsize, mesh,
                                  depth=prefetch_depth)

    # Loss readback is DEFERRED: float(loss) every step forces a device
    # round-trip (25-70 ms on the relay) inside a ~0.4 s step. Device
    # scalars are buffered and flushed every `log_every` steps and at save
    # points — identical log lines / train_loss.csv rows, just written in
    # small bursts.
    log_every = max(1, int(cfg.get("tpu", {}).get("log_every", 8)))
    # (epoch_idx, batch_idx, device_loss_array, index_or_None, step_seconds);
    # multi-step groups share ONE [K] loss array across their K entries
    # (indexed at flush on host — slicing a device array per entry would be
    # a dispatched program each on the relay)
    pending = []

    def flush_logs():
        if not pending:
            return
        # EVERY process synchronizes on the loss values here — only the file
        # writes below are primary-only. Skipping the device_get on
        # non-primary hosts lets them run arbitrarily far ahead of the async
        # device stream, dispatching later cross-process programs while
        # older steps are still in flight; combined with any device-level
        # barrier that is its own program, processes then initialize
        # collective cliques in different orders and deadlock (measured on a
        # 2-process CPU/gloo cluster). Lockstep here costs one tiny
        # replicated-scalar readback per flush.
        arrs, order = [], {}
        for _, _, arr, _, _ in pending:
            if id(arr) not in order:
                order[id(arr)] = len(arrs)
                arrs.append(arr)
        host_vals = jax.device_get(arrs)
        if not primary:  # one process owns train_log.txt / train_loss.csv
            pending.clear()
            return
        with open(loss_csv, "a") as f:
            for ep, bi, arr, j, dt in pending:
                v = host_vals[order[id(arr)]]
                lv = float(v if j is None else v[j])
                logger.info(f"epoch: {ep}, batch: {bi}, "
                            f"train loss: {lv:.4f}, time: {dt:.4f} s")
                f.write(f"{ep},{bi},{lv}\n")
        pending.clear()

    while batch_idx < total_batches:
        k_eff = 1
        if multi_step is not None:
            g = _group_len(batch_idx, steps_per_dispatch, total_batches,
                           batchsize, dataset_len, prev_epoch, save_epochs,
                           last_saved_epoch)
            # a shorter group (save boundary / run tail) falls back to
            # single steps — only TWO compiled programs ever exist
            if g == steps_per_dispatch:
                k_eff = g
        t0 = time.time()
        if k_eff > 1:
            try:
                group = [next(prefetcher) for _ in range(k_eff)]
            except StopIteration:
                break
            args = [b[0] for b in group] + [b[1] for b in group]
            params, batch_stats, opt_state, losses = multi_step(
                params, batch_stats, opt_state, *args)
            dt = time.time() - t0
            for j in range(k_eff):
                bi = batch_idx + j
                e = (bi * batchsize) // dataset_len
                pending.append((e, bi, losses, j, dt / k_eff))
                # by _group_len construction a save can fire only at the
                # group's last batch; the check mirrors the K=1 path
                if e != prev_epoch and e % save_epochs == 0 \
                        and e != last_saved_epoch:
                    flush_logs()
                    save(e, bi)
                    validate(e, bi)
                    last_saved_epoch = e
                prev_epoch = e
            batch_idx += k_eff
            if len(pending) >= log_every:
                flush_logs()
            continue
        try:
            images, segs, frames, names = next(prefetcher)
        except StopIteration:
            break
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, images, segs)
        dt = time.time() - t0

        epoch_idx = (batch_idx * batchsize) // dataset_len
        pending.append((epoch_idx, batch_idx, loss, None, dt))
        if len(pending) >= log_every:
            flush_logs()

        if cfg.debug.get("save_inputs", False) and jax.process_count() == 1:
            # debug crop dumps are a single-process inspection feature: under
            # multi-host only local batch rows are addressable
            from segmentation3d_tpu.io import Volume, write_image
            dbg = os.path.join(save_dir, "debug")
            for b, (frame, name) in enumerate(zip(frames, names)):
                img_np = np.asarray(images[b])
                for c in range(img_np.shape[-1]):
                    write_image(Volume(img_np[..., c], frame),
                                os.path.join(dbg, f"batch{batch_idx}_{name}_mod{c}.nii.gz"))
                write_image(Volume(np.asarray(segs[b]).astype(np.uint8), frame),
                            os.path.join(dbg, f"batch{batch_idx}_{name}_seg.nii.gz"))

        if epoch_idx != prev_epoch and epoch_idx % save_epochs == 0 \
                and epoch_idx != last_saved_epoch:
            flush_logs()  # csv/logs complete up to every checkpoint
            save(epoch_idx, batch_idx)
            validate(epoch_idx, batch_idx)
            last_saved_epoch = epoch_idx
        prev_epoch = epoch_idx
        batch_idx += 1

    prefetcher.stop()
    flush_logs()
    final_epoch = (batch_idx * batchsize) // dataset_len
    if final_epoch != last_saved_epoch:
        save(final_epoch, max(batch_idx - 1, 0))
        validate(final_epoch, max(batch_idx - 1, 0))
    if profile_dir:
        jax.profiler.stop_trace()
    if primary:
        from segmentation3d_tpu.utils.plotting import (plot_loss_curve,
                                                       plot_val_curve)
        plot_loss_curve(loss_csv)
        plot_val_curve(val_csv)
    logger.info("training finished")
    return save_dir
