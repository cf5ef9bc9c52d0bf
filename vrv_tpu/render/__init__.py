"""Render system: scene state, light structure, frame kernels, driver."""
