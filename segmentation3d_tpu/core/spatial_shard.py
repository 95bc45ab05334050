"""Spatially-sharded single-volume inference — halo exchange over the mesh.

The reference's answer to "volume too big" is algorithmic only (sliding-window
partition + coarse-to-fine, SURVEY.md §5 long-context row). This module adds
the TPU-native spatial analog of context parallelism: ONE huge volume's
z-axis is sharded over a 1-D ``data`` mesh, so no chip ever holds the full
volume or the full probability accumulator — the mode that runs where the
single-chip slab buffer won't fit (>512³).

Mechanism (all inside one ``shard_map``-ped jit):

1. each chip holds ``Dl = D/n`` z-planes of the volume;
2. one ``ppermute`` pulls the next chip's first ``pz`` planes (the input
   halo), so every full-XY slab patch whose z-start lies in this chip's
   range can be sliced locally;
3. each chip scans ITS OWN slab patches (z-starts owned by z-range) through
   the net, blending into a local ``[Dl+pz]``-plane accumulator pair;
4. a second ``ppermute`` sends the accumulator overflow (the ``pz`` planes
   past the local range) to the next chip, which adds it into its head;
5. weight-divide + argmax happen on the local planes; the mask comes back
   z-sharded.

Per-volume communication is two neighbor exchanges of ``pz`` planes — it
rides ICI; there is no replication and no full-volume collective.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def z_weight_profile(pz: int, kind: str = "gaussian", sigma_scale: float = 0.125):
    """Blend weight along z only ([pz,1,1,1]): slab patches span full XY, so
    an XY profile is a common factor of every patch covering a voxel and
    cancels exactly in the prob/wsum division — z-only is the cheap
    equivalent of the 3-D map in ``infer_engine.make_weight_map``."""
    if kind == "constant":
        return np.ones((pz, 1, 1, 1), np.float32)
    zz = np.linspace(-1.0, 1.0, pz)
    w = np.exp(-0.5 * (zz / (2.0 * sigma_scale)) ** 2)
    w = np.maximum(w, w.max() * 1e-3).astype(np.float32)
    return w[:, None, None, None]


def _z_starts(D: int, pz: int, sz: int) -> np.ndarray:
    """Slab z-start positions covering [0, D) (last box clamped flush)."""
    if D <= pz:
        return np.zeros((1,), np.int64)
    starts = list(range(0, D - pz + 1, sz))
    if starts[-1] != D - pz:
        starts.append(D - pz)
    return np.asarray(starts, np.int64)


class SpatialShardedInferer:
    """Sliding-window inference over ONE z-sharded volume (slab patches)."""

    def __init__(self, net, slab_z: int, num_classes: int, mesh,
                 stride_z: int | None = None, blend: str = "gaussian",
                 out_dtype=jnp.float32, apply_fn=None, apply_vars=None):
        self.net = net
        self.apply_fn = apply_fn
        self.pz = int(slab_z)
        self.sz = int(stride_z) if stride_z else max(self.pz - 16, 1)
        self.num_classes = int(num_classes)
        self.mesh = mesh
        self.weight = jnp.asarray(z_weight_profile(self.pz, blend))
        self.out_dtype = out_dtype
        # apply_fn's own parameter tree (fused forward) — substituted for
        # the caller's ``variables`` at __call__ (see SlidingWindowInferer)
        self.apply_vars = jax.device_put(apply_vars) \
            if apply_vars is not None else None

    def _fwd(self, variables, patch):
        if self.apply_fn is not None:
            return self.apply_fn(variables, patch, train=False)
        return self.net.apply(variables, patch, train=False)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _run(self, variables, vol, zstarts, zmask):
        """vol: [D,H,W,C] z-sharded P('data'); zstarts/zmask: [n, NB] with
        per-device LOCAL z-starts (sharded P('data'))."""
        mesh = self.mesh
        pz = self.pz
        nc = self.num_classes
        n = mesh.devices.size
        fwd_perm = [(j, j + 1) for j in range(n - 1)]   # d -> d+1
        bwd_perm = [(j + 1, j) for j in range(n - 1)]   # d+1 -> d

        def local(variables, vol, zs, zm):
            # vol: [Dl,H,W,C]; zs/zm: [1, NB] (this device's row)
            Dl = vol.shape[0]
            zs, zm = zs[0], zm[0]
            # input halo: the next ceil(pz/Dl) devices' leading planes, pulled
            # with one ppermute hop per device (a slab may span several
            # devices when pz > Dl); missing ring links yield zeros, which is
            # correct — no owned patch reads past the padded volume end
            parts, cur, need = [], vol, pz
            while need > 0:
                cur = jax.lax.ppermute(cur, "data", bwd_perm)
                take = min(Dl, need)
                parts.append(cur[:take])
                need -= take
            ext = jnp.concatenate([vol] + parts, axis=0)        # [Dl+pz,H,W,C]
            prob = jnp.zeros((Dl + pz,) + vol.shape[1:3] + (nc,), self.out_dtype)
            wsum = jnp.zeros((Dl + pz,) + vol.shape[1:3] + (1,), self.out_dtype)
            weight = self.weight.astype(self.out_dtype)

            def body(carry, inp):
                prob, wsum = carry
                z0, m = inp
                patch = jax.lax.dynamic_slice(
                    ext, (z0, 0, 0, 0), (pz,) + ext.shape[1:])
                p = self._fwd(variables, patch[None])[0].astype(self.out_dtype)
                w = weight * m
                cur_p = jax.lax.dynamic_slice(
                    prob, (z0, 0, 0, 0), (pz,) + prob.shape[1:])
                prob = jax.lax.dynamic_update_slice(prob, cur_p + p * w,
                                                    (z0, 0, 0, 0))
                cur_w = jax.lax.dynamic_slice(
                    wsum, (z0, 0, 0, 0), (pz,) + wsum.shape[1:])
                wsum = jax.lax.dynamic_update_slice(wsum, cur_w + w,
                                                    (z0, 0, 0, 0))
                return (prob, wsum), None

            (prob, wsum), _ = jax.lax.scan(
                body, (prob, wsum), (zs, zm.astype(self.out_dtype)))

            # accumulator overflow: planes [Dl, Dl+pz) belong to subsequent
            # devices — forward the remainder hop by hop, each device folding
            # the first Dl received planes into its own head
            rem_p, rem_w = prob[Dl:], wsum[Dl:]
            prob, wsum = prob[:Dl], wsum[:Dl]
            while rem_p.shape[0] > 0:
                rem_p = jax.lax.ppermute(rem_p, "data", fwd_perm)
                rem_w = jax.lax.ppermute(rem_w, "data", fwd_perm)
                take = min(Dl, rem_p.shape[0])
                prob = prob.at[:take].add(rem_p[:take])
                wsum = wsum.at[:take].add(rem_w[:take])
                rem_p, rem_w = rem_p[take:], rem_w[take:]
            prob = prob / jnp.maximum(wsum, 1e-8)
            mask = jnp.argmax(prob, axis=-1).astype(jnp.uint8)
            return prob, mask

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data")), check_vma=False,
        )(variables, vol, zstarts, zmask)

    def __call__(self, variables, vol, stride_zyx=None, return_prob=False):
        """vol: [D,H,W,C] (or [D,H,W]). D is padded to a multiple of the mesh
        size. Returns mask [D,H,W] uint8 (+ prob [D,H,W,NC] if requested).

        ``stride_zyx``: optional (sz, -, -) — only the z stride is honored
        (slab patches span full XY); keeps the call signature interchangeable
        with :class:`~segmentation3d_tpu.core.infer_engine.SlidingWindowInferer`.
        """
        if stride_zyx is not None:
            self.sz = int(np.asarray(stride_zyx).reshape(-1)[0])
        if self.apply_vars is not None:
            variables = self.apply_vars
        if vol.ndim == 3:
            vol = vol[..., None]
        D = vol.shape[0]
        n = self.mesh.devices.size
        Dl = -(-max(D, self.pz) // n)
        Dp = Dl * n
        if Dp != D:
            vol = jnp.pad(vol, ((0, Dp - D), (0, 0), (0, 0), (0, 0)))

        # global slab starts, assigned to the device owning the z-start
        starts = _z_starts(Dp, self.pz, self.sz)
        owner = np.minimum(starts // Dl, n - 1)
        nb = max(int(np.max(np.bincount(owner, minlength=n))), 1)
        zst = np.zeros((n, nb), np.int32)
        zmk = np.zeros((n, nb), np.float32)
        for d in range(n):
            mine = starts[owner == d] - d * Dl
            zst[d, :len(mine)] = mine
            zmk[d, :len(mine)] = 1.0

        shard = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())
        vol = jax.device_put(vol, shard)
        variables = jax.device_put(variables, repl)
        zst_d = jax.device_put(jnp.asarray(zst), shard)
        zmk_d = jax.device_put(jnp.asarray(zmk), shard)
        prob, mask = self._run(variables, vol, zst_d, zmk_d)
        mask = mask[:D]
        if return_prob:
            return mask, prob[:D]
        return mask
