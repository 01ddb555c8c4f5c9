"""Raster/vector operators subpackage."""
