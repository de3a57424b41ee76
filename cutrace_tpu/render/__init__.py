"""Render core: shading, device renderer, scalar CPU reference."""
