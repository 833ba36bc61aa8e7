"""Stateful framework objects: warp fields, voxel grids, fitters, networks."""
