"""Device-side compute ops: intersections, ray cast, BVH."""
