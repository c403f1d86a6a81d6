from odc_tpu.serve.engine import (  # noqa: F401
    ServingEngine,
    export_engine,
    load_engine,
    save_engine,
)
