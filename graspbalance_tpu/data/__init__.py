"""Data pipeline: GraspNet-1B loader (padded fixed-shape labels), synthetic
scene generation, offline label generators."""
