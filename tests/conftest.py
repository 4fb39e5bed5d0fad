"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests exercise a real Mesh without TPU hardware, per the driver contract.

Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This machine's sitecustomize force-registers the axon TPU backend and
# sets jax_platforms explicitly, overriding the env var — override it back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def toy_linedoc_rows():
    """Toy corpus rows in full WITH_BI_BLOOM column layout, modeled on the
    reference fixture iter_test_3_docs_tf_bi-bloom."""
    return [
        # doctitle, body, tokenized, offsets, positions, bloom(ends), bloom_before(begins)
        ["doc_0", "a", "a", "0,1;.", "0;.", "!", "!"],
        ["doc_1", "a a b", "a b", "0,1;2,3;.4,5;.", "0;1;.2;.", "a b!!", "!a!"],
        ["doc_2", "a b c", "a b c", "0,1;.2,3;.4,5;.", "0;.1;.2;.", "b!c!!", "!a!b!"],
    ]
