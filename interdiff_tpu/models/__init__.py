"""Flax models: MDM denoisers and ObjProjector correction networks."""
