"""Render-and-compare simulation — TPU-native equivalent of the reference
``simulation/`` module (SURVEY §2.13): depth rendering of a model from a
candidate pose + observation likelihood scoring (range_likelihood.h), used
for render-and-compare tracking. Rendering is point-splat z-buffering
(segment_min) instead of OpenGL.
"""

from pcl_tpu.simulation.range_likelihood import render_depth, range_likelihood
