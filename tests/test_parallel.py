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
