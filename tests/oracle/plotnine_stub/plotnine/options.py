"""Stub of plotnine.options (see package __init__)."""

figure_size = (6.4, 4.8)
