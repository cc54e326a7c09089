from interdiff_tpu.geometry import rotations
from interdiff_tpu.geometry.dct import dct_matrices
from interdiff_tpu.geometry.normals import vertex_normals
