from infgen_tpu.data.scenario import AgentData, MapData, Scenario, pad_axis  # noqa: F401
from infgen_tpu.data.synthetic import make_synthetic_scenario  # noqa: F401
