"""Test config: force an 8-device virtual CPU mesh before jax import.

Mirrors SURVEY.md §4's implication: multi-host tests run on
xla_force_host_platform_device_count instead of forked gRPC servers.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax with a TPU plugin (JAX_PLATFORMS=axon
# via sitecustomize); env vars are too late — force CPU through the config.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from tests.fixtures import toy_graph_json


@pytest.fixture(scope="session")
def toy_dir(tmp_path_factory):
    from euler_tpu.graph import convert_json_graph
    d = tmp_path_factory.mktemp("toy_graph")
    convert_json_graph(toy_graph_json(), str(d), n_partitions=2)
    return str(d)


@pytest.fixture(scope="session")
def toy_graph(toy_dir):
    from euler_tpu.graph import load_graph
    return load_graph(toy_dir)
