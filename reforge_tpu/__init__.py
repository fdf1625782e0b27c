"""reforge-tpu: a TPU-native image-processing graph engine.

A brand-new framework with the capabilities of calkhaz/reforge (a Vulkan
compute-shader graph engine): a tiny pipeline DSL describes a filter graph;
each node compiles to a JAX/Pallas image kernel; linear chains fuse into a
single XLA-jitted program; configs and kernels live-reload with
keep-last-good error handling; images decode/encode on the host via a native
libav extension; output goes to a live preview or an image file.

See SURVEY.md for the structural analysis of the reference and BASELINE.md
for performance targets.
"""

__version__ = "0.1.0"
