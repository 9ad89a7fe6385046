import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    from aiw_i2b2_etl_ray.util import cap_kernel_threads

    cap_kernel_threads()
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_changes(tmp_path_factory):
    """The t1-scale deterministic change log (~5k events / 3 repos)."""
    from aiw_i2b2_etl_ray.sources.synth import generate_changes

    d = str(tmp_path_factory.mktemp("changes_tiny"))
    generate_changes(
        d,
        5000,
        n_repos=3,
        paths_per_repo=40,
        seed=42,
        rows_per_file=1500,
        evo_frac=0.7,
    )
    return d


@pytest.fixture(scope="session")
def tiny_oracle(tiny_changes):
    from aiw_i2b2_etl_ray import oracle
    from aiw_i2b2_etl_ray.sources.changes import read_changes_table

    return oracle.replay(read_changes_table(tiny_changes))


SF_DIR = "/root/testdata/sf0.001"
