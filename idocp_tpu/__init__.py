"""idocp_tpu — TPU-native inverse-dynamics optimal control.

A from-scratch JAX/XLA framework with the capabilities of the reference
C++ library `mayataka/idocp` (whole-body OCP/MPC for rigid-body robots
with contacts and impulses; see SURVEY.md). The public surface mirrors the
reference's API nouns (Robot model, CostFunction components, Constraints
components, ContactSequence, OCPSolver / ParNMPCSolver / Unconstr*
variants) while the implementation is one jitted pure function per solver
iteration, vmapped over stages and scenarios and sharded over device
meshes.
"""
from .robot.model import (ModelBuilder, RobotModel, difference, integrate,
                          random_configuration)
from .robot.urdf import load_urdf
from .robot.contact import ContactModel, ContactStatus
from .cost.base import CostComponent
from .cost.components import (CoMCost, ConfigurationSpaceCost,
                              ContactForceCost, TaskSpace3DCost,
                              TaskSpace6DCost)
from .constraints.components import (
    ConstraintComponent, FrictionCone,
    JointAccelerationLowerLimit, JointAccelerationUpperLimit,
    JointPositionLowerLimit, JointPositionUpperLimit,
    JointTorquesLowerLimit, JointTorquesUpperLimit,
    JointVelocityLowerLimit, JointVelocityUpperLimit)
from .hybrid.schedule import (ContactSequence, DiscreteEvent,
                              HorizonSchedule, static_schedule)
from .ocp.data import Solution, zero_solution
from .solver.options import SolverOptions
from .solver.ocp_solver import OCPSolver
from .solver.unconstr_ocp_solver import UnconstrOCPSolver
from .solver.parnmpc_solver import ParNMPCSolver, UnconstrParNMPCSolver
from .solver.mpc import MPC, TrotGait
from .parallel.batch import BatchedSolver, batch_solution, make_mesh
from .utils.benchmarker import benchmark_convergence, benchmark_solver
from .utils.checkpoint import load_solution, save_solution

__version__ = "0.1.0"

__all__ = [
    "ModelBuilder", "RobotModel", "difference", "integrate",
    "random_configuration", "load_urdf", "ContactModel", "ContactStatus",
    "CostComponent", "CoMCost", "ConfigurationSpaceCost", "ContactForceCost",
    "TaskSpace3DCost", "TaskSpace6DCost",
    "ConstraintComponent", "FrictionCone",
    "JointAccelerationLowerLimit", "JointAccelerationUpperLimit",
    "JointPositionLowerLimit", "JointPositionUpperLimit",
    "JointTorquesLowerLimit", "JointTorquesUpperLimit",
    "JointVelocityLowerLimit", "JointVelocityUpperLimit",
    "ContactSequence", "DiscreteEvent", "HorizonSchedule", "static_schedule",
    "Solution", "zero_solution",
    "SolverOptions", "OCPSolver", "UnconstrOCPSolver",
    "ParNMPCSolver", "UnconstrParNMPCSolver", "MPC", "TrotGait",
    "BatchedSolver", "batch_solution", "make_mesh",
    "benchmark_convergence", "benchmark_solver",
    "load_solution", "save_solution",
]
