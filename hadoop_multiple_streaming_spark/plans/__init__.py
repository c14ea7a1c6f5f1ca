from .model import Branch, JobSpec  # noqa: F401
from .runner import BranchResult, JobResult, plan_branches, run_job  # noqa: F401
