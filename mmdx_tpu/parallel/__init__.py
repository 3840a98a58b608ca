"""Multi-chip scaling: jax.sharding Mesh + GSPMD sharding rules (dp x tp)."""
