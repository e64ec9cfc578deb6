"""Auxiliary debugging tools, mirroring the reference's extra binaries."""
