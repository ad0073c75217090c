from .mesh import device_mesh, mesh_axes
from .step import make_pipeline_step, dryrun_step
