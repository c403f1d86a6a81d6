from odc_tpu.serve.engine import (  # noqa: F401
    ServingEngine,
    export_engine,
    load_engine,
    save_engine,
)
from odc_tpu.serve.server import BatchingServer  # noqa: F401
