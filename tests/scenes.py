"""Re-export of the programmatic test scenes (see nart_tpu.testing)."""

from nart_tpu.testing import quad, simple_scene  # noqa: F401
