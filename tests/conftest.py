import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_engine_dirs(tmp_path):
    from kafka_connect_mongo_ray.config import EngineConfig

    return EngineConfig(
        snapshot_dir=str(tmp_path / "snapshot"),
        checkpoint_dir=str(tmp_path / "checkpoints"),
        num_buckets=8,
        batch_size=512,
    )
