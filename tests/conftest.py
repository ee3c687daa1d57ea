"""Test config: force an 8-device virtual CPU mesh.

The real TPU is one chip behind the axon tunnel; unit tests run on virtual
CPU devices. The axon sitecustomize imports jax at interpreter startup, so
plain env-var assignment here is too late for JAX_PLATFORMS — we go through
jax.config (which takes effect at backend init, i.e. first device use).
XLA_FLAGS is read at backend init too, so appending here still works.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got " + str(jax.devices()[:1])
    )
    assert len(jax.devices()) == 8
