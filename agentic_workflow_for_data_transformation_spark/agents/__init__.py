from .orchestrator import (
    TransformState,
    planner_agent,
    execution_agent,
    critic_agent,
    run_transform,
    run_eval,
)

__all__ = [
    "TransformState",
    "planner_agent",
    "execution_agent",
    "critic_agent",
    "run_transform",
    "run_eval",
]
