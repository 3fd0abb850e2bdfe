import os

# Tests run on a virtual 8-device CPU mesh.  In this environment jax is
# preloaded at interpreter start (sitecustomize) with JAX_PLATFORMS=axon (one
# real TPU over a tunnel), so env vars alone are too late — switch the platform
# through jax.config before any backend is initialized.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
