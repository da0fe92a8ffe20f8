"""Font fitting: gradient descent on outline control points.

North-star config 5: match target SDF bitmaps (e.g. rendered from a
reference font by the parity pipeline) by optimizing Bezier control
points and per-glyph placement, batched over glyphs and sharded over a
device mesh. Parameters:

- ``curves``    [B, C, 4, 2] — per-glyph cubic control points (sharded
                 over the 'data' mesh axis with the batch)
- ``translate`` [B, 2]      — per-glyph placement (sharded)
- ``log_gain``  []          — a shared global scale (replicated; its
                 gradient forces the cross-device all-reduce that the
                 north star wants overlapped with the backward pass —
                 XLA emits the psum from the sharding alone)

Optimization state is optax Adam; checkpoint/resume via orbax (the
reference has no checkpointing — a render run is restartable — but a
fitting run is long-lived training and gets the standard treatment).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .glyph_model import glyph_field, sdf_loss


@dataclass
class FitBatch:
    """Device-ready fitting workload (see `make_fit_batch`)."""

    curves0: np.ndarray  # [B, C, 4, 2] initial control points
    curve_mask: np.ndarray  # [B, C] bool
    px: np.ndarray  # [B, P] pixel-center x
    py: np.ndarray  # [B, P] pixel-center y
    pix_mask: np.ndarray  # [B, P] f32 (1 = real pixel)
    target: np.ndarray  # [B, P] target signed distances
    meta: np.ndarray | None = None  # [B, 4] i32 (x0, y0, w, h) per glyph
    # (the kernel backend derives pixel coords from meta instead of px/py)


def init_params(curves0: np.ndarray) -> dict:
    return {
        "curves": jnp.asarray(curves0, jnp.float32),
        "translate": jnp.zeros((curves0.shape[0], 2), jnp.float32),
        "log_gain": jnp.zeros((), jnp.float32),
    }


def batch_loss(params, batch: dict, depth: int, sharpness):
    def one(curves, cmask, tr, px, py, pmask, target):
        field = glyph_field(
            curves, cmask, tr, px, py, depth=depth, sharpness=sharpness
        )
        return sdf_loss(field * jnp.exp(params["log_gain"]), target, pmask)

    losses = jax.vmap(one)(
        params["curves"],
        batch["curve_mask"],
        params["translate"],
        batch["px"],
        batch["py"],
        batch["pix_mask"],
        batch["target"],
    )
    return jnp.mean(losses)


def batch_loss_kernel(params, batch: dict, depth: int, interpret=None):
    """Kernel-backed twin of `batch_loss`: the signed field comes from
    the fused Pallas forward/backward pair (`ops.sdf_grad`) instead of
    the jnp pair tensor — no [P, S] intermediate in HBM, one launch for
    the whole batch. Hard-min semantics only (``sharpness`` has no
    kernel path); gradients flow segs → subdivided chords → control
    points exactly as in the jnp path (SURVEY §7 step 5)."""
    from ..ops.sdf_grad import signed_field_pallas
    from .glyph_model import curves_to_segments

    curves = params["curves"] + params["translate"][:, None, None, :]
    segs = curves_to_segments(curves, depth)
    seg_mask = jnp.repeat(batch["curve_mask"], 2**depth, axis=-1)
    P = batch["target"].shape[1]
    field = signed_field_pallas(
        segs, seg_mask, batch["meta"], P, interpret=interpret
    )
    # Same normalization as `batch_loss`: per-glyph masked mean, then
    # mean over the batch (so the two backends' losses/grads agree).
    losses = jax.vmap(sdf_loss)(
        field * jnp.exp(params["log_gain"]), batch["target"], batch["pix_mask"]
    )
    return jnp.mean(losses)


def make_sharded_kernel_loss(mesh, depth: int, B_real: int):
    """Mesh-sharded twin of `batch_loss_kernel`: the batch axis is
    sharded over the mesh's single axis with `shard_map`, every shard
    runs the custom-VJP Pallas pair on its local glyphs, and the scalar
    loss is the `psum` of per-shard sums over the REAL batch size
    (padded glyphs contribute exactly zero). Reverse mode through
    `shard_map` transposes that psum into the replicated-parameter
    all-reduce the north star wants riding ICI — with the kernel
    backend, not just the jnp one. Returns ``loss_fn(params, batch)``.
    """
    from jax.sharding import PartitionSpec as P

    from ..ops.sdf_grad import signed_field_pallas as _field
    from .glyph_model import curves_to_segments as _c2s

    axis = mesh.axis_names[0]
    sb = P(axis)

    def local(curves, translate, log_gain, cmask, meta, target, pmask):
        c = curves + translate[:, None, None, :]
        segs = _c2s(c, depth)
        smask = jnp.repeat(cmask, 2**depth, axis=-1)
        field = _field(segs, smask, meta, target.shape[1])
        losses = jax.vmap(sdf_loss)(field * jnp.exp(log_gain), target, pmask)
        return jax.lax.psum(jnp.sum(losses), axis) / B_real

    # check_vma=False: pallas_call outputs carry no vma annotation (see
    # parallel.mesh.sharded_pts_render_fn).
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(sb, sb, P(), sb, sb, sb, sb),
        out_specs=P(),
        check_vma=False,
    )

    def loss_fn(params, batch):
        return fn(
            params["curves"],
            params["translate"],
            params["log_gain"],
            batch["curve_mask"],
            batch["meta"],
            batch["target"],
            batch["pix_mask"],
        )

    return loss_fn


class FontFitter:
    """Owns the optimizer and the jitted, mesh-sharded train step."""

    def __init__(
        self,
        mesh=None,
        depth: int = 3,
        learning_rate: float = 0.01,
        sharpness: float | None = None,
        backend: str = "jnp",
    ):
        """``backend='jnp'`` autodiffs the pair-tensor model;
        ``backend='pallas'`` runs forward AND backward through the
        fused kernels (`ops.sdf_grad`) — hard-min only (no
        ``sharpness``), needs `FitBatch.meta`. With a mesh, the pallas
        backend shard_maps the kernel pair over the batch axis
        (`make_sharded_kernel_loss`); the jnp backend leaves sharding
        to XLA's auto-spmd."""
        import optax

        if backend == "pallas" and sharpness is not None:
            raise ValueError("backend='pallas' supports hard-min only")
        self.mesh = mesh
        self.depth = depth
        self.sharpness = sharpness
        self.backend = backend
        self.opt = optax.adam(learning_rate)
        self._kernel_mesh_loss = None  # built by init() (needs B_real)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _step(params, opt_state, batch):
            if backend == "pallas":
                if self._kernel_mesh_loss is not None:
                    loss, grads = jax.value_and_grad(self._kernel_mesh_loss)(
                        params, batch
                    )
                else:
                    loss, grads = jax.value_and_grad(batch_loss_kernel)(
                        params, batch, self.depth
                    )
            else:
                loss, grads = jax.value_and_grad(batch_loss)(
                    params, batch, self.depth, self.sharpness
                )
            updates, opt_state = self.opt.update(grads, opt_state, params)
            import optax as _optax

            params = _optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = _step

    # -- state ----------------------------------------------------------

    def init(self, batch: FitBatch):
        """Initial (params, opt_state, device batch). With a mesh, the
        batch axis of every array is sharded over 'data' and the scalar
        gain is replicated — XLA derives the psum for its gradient."""
        if self.backend == "pallas" and batch.meta is None:
            raise ValueError("backend='pallas' needs FitBatch.meta")
        if self.backend == "pallas" and self.mesh is not None:
            # shard_map needs the batch axis divisible by the mesh;
            # padded glyphs (all-false masks, w=h=0 metas) contribute
            # exactly zero loss and gradient, and the sharded loss
            # normalizes by the REAL batch size.
            import dataclasses

            from ..parallel.mesh import pad_to_multiple

            B_real = batch.curves0.shape[0]
            D = self.mesh.devices.size
            batch = dataclasses.replace(
                batch,
                **{
                    f.name: pad_to_multiple(getattr(batch, f.name), D)
                    for f in dataclasses.fields(batch)
                    if getattr(batch, f.name) is not None
                },
            )
            self._kernel_mesh_loss = make_sharded_kernel_loss(
                self.mesh, self.depth, B_real
            )
        params = init_params(batch.curves0)
        dev_batch = {
            "curve_mask": jnp.asarray(batch.curve_mask),
            "px": jnp.asarray(batch.px, jnp.float32),
            "py": jnp.asarray(batch.py, jnp.float32),
            "pix_mask": jnp.asarray(batch.pix_mask, jnp.float32),
            "target": jnp.asarray(batch.target, jnp.float32),
        }
        if self.backend == "pallas":
            dev_batch["meta"] = jnp.asarray(batch.meta, jnp.int32)
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            bs = batch_sharding(self.mesh)
            rep = replicated(self.mesh)
            params = {
                k: jax.device_put(v, rep if v.ndim == 0 else bs)
                for k, v in params.items()
            }
            dev_batch = {k: jax.device_put(v, bs) for k, v in dev_batch.items()}
        opt_state = self.opt.init(params)
        return params, opt_state, dev_batch

    def step(self, params, opt_state, dev_batch):
        return self._step(params, opt_state, dev_batch)

    def fit(self, batch: FitBatch, steps: int = 200, log_every: int = 0):
        params, opt_state, dev_batch = self.init(batch)
        history = []
        for i in range(steps):
            params, opt_state, loss = self.step(params, opt_state, dev_batch)
            if log_every and (i % log_every == 0 or i == steps - 1):
                history.append((i, float(loss)))
        return params, history

    # -- checkpointing (orbax) ------------------------------------------

    @staticmethod
    def save_checkpoint(path: str, params, opt_state) -> None:
        """Host checkpoint via orbax (arrays gathered to numpy first, so
        restore needs no sharding spec; re-`init`/`device_put` after
        restore re-establishes mesh placement)."""
        import orbax.checkpoint as ocp

        state = jax.tree.map(np.asarray, {"params": params, "opt_state": opt_state})
        ocp.PyTreeCheckpointer().save(path, state)

    @staticmethod
    def restore_checkpoint(path: str, like=None):
        """``like`` is a (params, opt_state) template (e.g. from a fresh
        `init`) used to rebuild container types — optax states are
        NamedTuples, which a bare pytree restore would flatten to
        dicts."""
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        if like is None:
            state = ckpt.restore(path)
            return state["params"], state["opt_state"]
        template = jax.tree.map(
            np.asarray, {"params": like[0], "opt_state": like[1]}
        )
        state = ckpt.restore(path, item=template)
        return state["params"], state["opt_state"]


def pixel_grid(prep) -> tuple[np.ndarray, np.ndarray]:
    """Pixel-center coordinates of a `GlyphPrep`'s bitmap in PBF
    (Y-flipped row-major) order — host twin of
    `ops.sdf_jax.pixel_coords`."""
    w, h = prep.width, prep.height
    i = np.arange(w * h)
    x = i % w
    y = h - 1 - i // w
    return (prep.x0 + x + 0.5).astype(np.float32), (prep.y0 + y + 0.5).astype(
        np.float32
    )


def make_fit_batch(
    entry,
    codepoints,
    depth: int = 3,
    target_entry=None,
) -> FitBatch:
    """Build a FitBatch from a font: initial curves come from
    ``entry``'s outlines (pixel space, with the same scale + sub-pixel
    shift as the parity pipeline), targets from the exact renderer on
    ``target_entry`` (default: the same font — a self-fit, useful for
    validating gradients and as a regularized starting point).
    """
    from ..ops.sdf_ref import render_sdf_exact
    from ..render.metrics import prepare_glyph
    from .glyph_model import bytes_to_field

    target_entry = target_entry or entry
    items = []
    for cp in codepoints:
        name = entry.glyph_name(cp)
        tname = target_entry.glyph_name(cp)
        if name is None or tname is None:
            continue
        rings = target_entry.outline_rings(tname)
        prep = prepare_glyph(
            cp, rings, target_entry.units_per_em, target_entry.hor_advance(tname)
        )
        if prep.empty:
            continue
        curves = entry.outline_curves(name)
        if curves.shape[0] == 0:
            continue
        # Same placement transform as the parity pipeline
        # (renderer.rs:122-131): scale to 24px/EM, shift by dx.
        scale = 24.0 / entry.units_per_em
        curves = curves * scale + np.array([prep.dx, 0.0])
        bitmap = render_sdf_exact(
            prep.segments, prep.width, prep.height, prep.x0, prep.y0
        )
        target = np.asarray(bytes_to_field(jnp.asarray(bitmap)))
        px, py = pixel_grid(prep)
        items.append(
            (curves, px, py, target, (prep.x0, prep.y0, prep.width, prep.height))
        )

    if not items:
        raise ValueError("no fittable glyphs among the given codepoints")

    B = len(items)
    C_max = max(c.shape[0] for c, *_ in items)
    P_max = max(len(px) for _, px, *_ in items)
    curves0 = np.zeros((B, C_max, 4, 2), np.float32)
    curve_mask = np.zeros((B, C_max), bool)
    pxs = np.zeros((B, P_max), np.float32)
    pys = np.zeros((B, P_max), np.float32)
    pix_mask = np.zeros((B, P_max), np.float32)
    targets = np.zeros((B, P_max), np.float32)
    metas = np.zeros((B, 4), np.int32)
    for b, (c, px, py, tg, m) in enumerate(items):
        curves0[b, : c.shape[0]] = c
        curve_mask[b, : c.shape[0]] = True
        n = len(px)
        pxs[b, :n] = px
        pys[b, :n] = py
        pix_mask[b, :n] = 1.0
        targets[b, :n] = tg
        metas[b] = m
    return FitBatch(curves0, curve_mask, pxs, pys, pix_mask, targets, metas)
