"""Model stacks (Flax/JAX): MANO, HaMeR, MoGe-2, Hunyuan3D-2 DiT/ShapeVAE."""
