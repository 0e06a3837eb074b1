"""Shim: the synthetic-scene generator moved into the package proper
(gsjax/data/synth.py) so the golden-quality tracking script can use it."""

from gsjax.data.synth import (  # noqa: F401
    arc_pose,
    make_gaussians,
    ring_pose,
    sphere_gaussians,
    write_rendered_colmap,
)
