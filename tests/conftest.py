import os

# Force tests onto a virtual 8-device CPU mesh. NOTE: this environment may
# pin JAX_PLATFORMS to a TPU plugin and ignore the env-var override, so the
# platform is forced through jax.config after import (verified to win).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
