import os

# Force tests onto a virtual 8-device CPU mesh before jax initializes;
# real-TPU paths are exercised by bench.py / the driver instead.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
