from .graph_sim import SimulatedPRG, simulate_prg_package
from .read_sim import ReadSimulator, SimulatedPair
from .truth import TrueReadLevels
