"""JobControl: DAG of jobs with dependencies.

Reference: mapred/jobcontrol/JobControl.java:40-72,137-139 — jobs move
WAITING→READY→RUNNING→SUCCESS/FAILED; a job becomes READY when all its
depending jobs succeeded. Within one Spark app most multi-job pipelines
collapse into a single DataFrame plan; this helper exists for pipelines
with genuine materialization barriers (write → read back → next job).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum


class State(Enum):
    WAITING = "waiting"
    READY = "ready"
    RUNNING = "running"
    SUCCESS = "success"
    FAILED = "failed"
    DEPENDENT_FAILED = "dependent_failed"


@dataclass
class Job:
    name: str
    fn: Callable[[], object]
    deps: list[str] = field(default_factory=list)
    state: State = State.WAITING
    result: object = None
    error: Exception | None = None


class JobControl:
    def __init__(self) -> None:
        self._jobs: dict[str, Job] = {}

    def add_job(self, name: str, fn: Callable[[], object], deps: list[str] | None = None) -> Job:
        job = Job(name=name, fn=fn, deps=list(deps or []))
        self._jobs[name] = job
        return job

    def job(self, name: str) -> Job:
        return self._jobs[name]

    def run(self) -> dict[str, State]:
        """Run jobs in dependency order (sequential; Spark provides the
        intra-job parallelism). Failure marks dependents
        DEPENDENT_FAILED, like the reference."""
        pending = dict(self._jobs)
        progressed = True
        while pending and progressed:
            progressed = False
            for name in list(pending):
                job = pending[name]
                dep_states = [self._jobs[d].state for d in job.deps]
                if any(s in (State.FAILED, State.DEPENDENT_FAILED) for s in dep_states):
                    job.state = State.DEPENDENT_FAILED
                    del pending[name]
                    progressed = True
                    continue
                if all(s == State.SUCCESS for s in dep_states):
                    job.state = State.RUNNING
                    try:
                        job.result = job.fn()
                        job.state = State.SUCCESS
                    except Exception as ex:  # noqa: BLE001 - job isolation
                        job.error = ex
                        job.state = State.FAILED
                    del pending[name]
                    progressed = True
        for job in pending.values():  # dependency cycle
            job.state = State.DEPENDENT_FAILED
        return {n: j.state for n, j in self._jobs.items()}
