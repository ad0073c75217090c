"""Sharded pipeline step on the virtual 8-device CPU mesh."""

import numpy as np

from gam_ngs_tpu.parallel import device_mesh, dryrun_step, mesh_axes
from gam_ngs_tpu.parallel.mesh import DATA_AXIS, HOST_AXIS


def test_mesh_axes():
    assert mesh_axes(8) == (2, 4)
    assert mesh_axes(6) == (2, 3)
    assert mesh_axes(7) == (1, 7)
    assert mesh_axes(1) == (1, 1)


def test_mesh_shape():
    mesh = device_mesh(8)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == (HOST_AXIS, DATA_AXIS)


def test_dryrun_step_runs_and_validates():
    mesh = device_mesh(8)
    out = dryrun_step(mesh)
    # dirs sharded over batch: 16 problems, 64 rows
    assert out[0].shape[0] == 16
    assert float(out[6]) > 0


def test_step_sharding_layout():
    import jax

    mesh = device_mesh(8)
    out = dryrun_step(mesh)
    dirs, lib_count = out[0], out[3]
    # batch outputs sharded over all 8 devices; stats replicated
    assert len(dirs.sharding.device_set) == 8
    assert lib_count.sharding.is_fully_replicated


def test_engine_sharded_over_mesh():
    """align_many with a mesh shards the batch over all 8 CPU devices
    and stays oracle-exact."""
    import numpy as np

    from gam_ngs_tpu.ops.bsw_batch import BswEngine
    from gam_ngs_tpu.ops.bsw_ref import bsw_align

    mesh = device_mesh(8)
    eng = BswEngine(band=20, mesh=mesh)
    rng = np.random.default_rng(31)
    probs = []
    for k in range(21):  # pads to 3 per device -> B=64 on the mesh
        a = rng.integers(0, 5, size=int(rng.integers(60, 200))).astype(
            np.uint8)
        b = a[5:].copy()
        m = rng.random(len(b)) < 0.05
        b[m] = (b[m] + 1) % 5
        probs.append((a, 0, len(a) - 1, b, 0, len(b) - 1, False, False))
    got = eng.align_many(probs)
    for g, p in zip(got, probs):
        want = bsw_align(*p, band=20)
        assert g.score == want.score
        assert g.edits.tolist() == want.edits.tolist()
