import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    def _quiet_worker_logging():
        import logging

        logging.getLogger("ray.data").setLevel(logging.ERROR)

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        runtime_env={"worker_process_setup_hook": _quiet_worker_logging},
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()
