"""Font-fitting tests: optimization convergence (single device) and the
mesh-sharded train step over 8 virtual CPU devices (the multi-chip
emulation strategy — SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from versatiles_glyphs_tpu.models.fitting import FontFitter, make_fit_batch
from versatiles_glyphs_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def fit_batch(fira_entry):
    # Self-fit two glyphs, perturbed start.
    return make_fit_batch(fira_entry, [111, 110])  # 'o', 'n'


def test_fit_recovers_perturbed_outline(fit_batch):
    rng = np.random.default_rng(1)
    batch = fit_batch
    noisy = batch.curves0 + rng.normal(0, 0.35, batch.curves0.shape).astype(
        np.float32
    ) * batch.curve_mask[..., None, None]
    import dataclasses

    noisy_batch = dataclasses.replace(batch, curves0=noisy)

    fitter = FontFitter(depth=2, learning_rate=0.01)
    params, opt_state, dev_batch = fitter.init(noisy_batch)
    losses = []
    for _ in range(200):
        params, opt_state, loss = fitter.step(params, opt_state, dev_batch)
        losses.append(float(loss))
    # The hard-min objective is noisy step-to-step; judge convergence
    # by the best point of the trajectory plus a no-blowup check.
    assert min(losses) < 0.5 * losses[0], (losses[0], min(losses), losses[-1])
    assert losses[-1] < losses[0]
    assert np.isfinite(np.asarray(params["curves"])).all()


def test_fit_sharded_over_cpu_mesh(fit_batch):
    """Full train step jitted over an 8-device mesh: batch sharded on
    'data', scalar gain replicated (its gradient is the all-reduce)."""
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest requests 8 virtual CPU devices"
    mesh = make_mesh(devs[:8])

    # Pad batch to 8 glyphs by tiling.
    import dataclasses

    b = fit_batch
    reps = -(-8 // b.curves0.shape[0])
    batch8 = dataclasses.replace(
        b,
        curves0=np.tile(b.curves0, (reps, 1, 1, 1))[:8],
        curve_mask=np.tile(b.curve_mask, (reps, 1))[:8],
        px=np.tile(b.px, (reps, 1))[:8],
        py=np.tile(b.py, (reps, 1))[:8],
        pix_mask=np.tile(b.pix_mask, (reps, 1))[:8],
        target=np.tile(b.target, (reps, 1))[:8],
    )

    fitter = FontFitter(mesh=mesh, depth=2, learning_rate=0.05)
    params, opt_state, dev_batch = fitter.init(batch8)
    # Verify the intended placements.
    assert len(params["curves"].sharding.device_set) == 8
    assert len(params["log_gain"].sharding.device_set) == 8  # replicated

    p, o, loss1 = fitter.step(params, opt_state, dev_batch)
    p, o, loss2 = fitter.step(p, o, dev_batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))

    # Sharded result must match the single-device run numerically.
    fitter1 = FontFitter(mesh=None, depth=2, learning_rate=0.05)
    p1, o1, db1 = fitter1.init(batch8)
    _, _, loss1_single = fitter1.step(p1, o1, db1)
    np.testing.assert_allclose(float(loss1), float(loss1_single), rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path, fit_batch):
    fitter = FontFitter(depth=2)
    params, opt_state, dev_batch = fitter.init(fit_batch)
    params, opt_state, _ = fitter.step(params, opt_state, dev_batch)
    path = str(tmp_path / "ckpt")
    FontFitter.save_checkpoint(path, params, opt_state)
    fresh_p, fresh_o, _ = FontFitter(depth=2).init(fit_batch)
    params2, opt_state2 = FontFitter.restore_checkpoint(path, like=(fresh_p, fresh_o))
    np.testing.assert_array_equal(
        np.asarray(params["curves"]), np.asarray(params2["curves"])
    )
    # Resume training from the restored state.
    _, _, loss = fitter.step(params2, opt_state2, dev_batch)
    assert np.isfinite(float(loss))


def test_fit_cli_end_to_end(tmp_path):
    """`fit` CLI over 2 codepoints x 10 steps: the npz/orbax/history
    output contract (cli.py cmd_fit)."""
    import io
    import json
    import os

    from versatiles_glyphs_tpu.cli import main

    FIRA = "/root/reference/testdata/Fira Sans - Regular.ttf"
    out = tmp_path / "fit_out"
    main(
        [
            "fit", FIRA, "--codepoints", "110,111", "--steps", "10",
            "--depth", "2", "-o", str(out),
        ],
        stdout=io.StringIO(),
    )
    # fitted.npz: curves + placement params + mask + codepoints.
    data = np.load(out / "fitted.npz")
    assert list(data["codepoints"]) == [110, 111]
    assert data["curves"].shape[0] == 2
    assert data["curves"].shape[2:] == (4, 2)
    assert data["curve_mask"].shape[:1] == (2,)
    assert data["translate"].shape == (2, 2)
    assert data["log_gain"].shape == ()  # global sharpness gain

    # orbax checkpoint restores to the same params.
    from versatiles_glyphs_tpu.models.fitting import FontFitter

    params, opt_state = FontFitter.restore_checkpoint(str(out / "checkpoint"))
    np.testing.assert_allclose(
        np.asarray(params["curves"]), data["curves"], rtol=0, atol=0
    )

    # history.json: monotone steps, finite losses, final step present.
    hist = json.loads((out / "history.json").read_text())
    steps = [h["step"] for h in hist]
    assert steps == sorted(steps) and steps[-1] == 9
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert os.path.isdir(out / "checkpoint")


def test_step_many_matches_sequential(fit_batch):
    """K scan-chained steps (`step_many`, the production dispatch shape)
    must follow the same trajectory as K individual `step` calls."""
    fitter = FontFitter(depth=2, learning_rate=0.01)
    p1, o1, dev = fitter.init(fit_batch)
    seq = []
    for _ in range(4):
        p1, o1, loss = fitter.step(p1, o1, dev)
        seq.append(float(loss))

    p2, o2, _ = fitter.init(fit_batch)
    p2, o2, losses = fitter.step_many(p2, o2, dev, 4)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(seq), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(p2["curves"]), np.asarray(p1["curves"]), atol=1e-5
    )
