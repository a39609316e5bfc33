"""TwoPhaseScheduler unit tests: ordered streaming yield, error propagation,
phase-1/generator timeouts, request-level concurrency, and lifecycle cleanup
(the reference's scheduler behaviors, two_phase_scheduler.py:149-350, tested
hermetically — the reference ships no tests for it)."""
import asyncio
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from auralis_tpu.common.scheduler import TaskState, TwoPhaseScheduler


def run(coro):
    return asyncio.run(coro)


def _first_phase(parallel_inputs):
    async def fn(_inputs):
        return {"parallel_inputs": parallel_inputs}

    return fn


def test_outputs_yield_in_chunk_order():
    """Chunk 0's items must all be emitted before chunk 1's, even when chunk
    1 finishes first (reference ordering contract, :308-350)."""

    async def main():
        sched = TwoPhaseScheduler(second_phase_concurrency=4)

        async def gen(idx):
            if idx == 0:
                await asyncio.sleep(0.05)  # chunk 0 is slower
            yield (idx, "a")
            yield (idx, "b")

        out = []
        async for item in sched.run("in", _first_phase([0, 1, 2]), gen):
            out.append(item)
        return out

    out = run(main())
    assert out == [(0, "a"), (0, "b"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]


def test_generator_error_propagates():
    async def main():
        sched = TwoPhaseScheduler(second_phase_concurrency=2)

        async def gen(idx):
            if idx == 1:
                raise RuntimeError("boom in chunk 1")
            yield idx

        items = []
        with pytest.raises(RuntimeError, match="boom in chunk 1"):
            async for item in sched.run("in", _first_phase([0, 1]), gen):
                items.append(item)
        assert items == [0]  # chunk 0 emitted before the failure surfaced
        assert not sched.active_requests  # cleaned up

    run(main())


def test_first_phase_timeout():
    async def main():
        sched = TwoPhaseScheduler(second_phase_concurrency=1, request_timeout=0.05)

        async def slow_first(_):
            await asyncio.sleep(10)

        async def gen(_):
            yield 1

        with pytest.raises(TimeoutError):
            async for _ in sched.run("in", slow_first, gen):
                pass

    run(main())


def test_generator_timeout():
    async def main():
        sched = TwoPhaseScheduler(second_phase_concurrency=1, generator_timeout=0.05)

        async def gen(_):
            await asyncio.sleep(10)
            yield 1

        with pytest.raises((TimeoutError, RuntimeError)):
            async for _ in sched.run("in", _first_phase([0]), gen):
                pass

    run(main())


def test_request_concurrency_limit():
    """At most `second_phase_concurrency` requests hold phase 1+2 at once;
    chunk generators have 4x headroom (see scheduler.py generator_concurrency)."""

    async def main():
        sched = TwoPhaseScheduler(second_phase_concurrency=2)
        in_flight, peak = 0, 0

        async def first(_):
            nonlocal in_flight, peak
            in_flight += 1
            peak = max(peak, in_flight)
            await asyncio.sleep(0.02)
            return {"parallel_inputs": [0]}

        async def gen(_):
            await asyncio.sleep(0.02)
            yield 1

        async def one():
            nonlocal in_flight
            async for _ in sched.run("in", first, gen):
                pass
            in_flight -= 1

        await asyncio.gather(*(one() for _ in range(6)))
        return peak

    assert run(main()) <= 2


def test_lifecycle_state_and_cleanup():
    async def main():
        sched = TwoPhaseScheduler(second_phase_concurrency=1)
        states = []

        async def first(_):
            states.append(next(iter(sched.active_requests.values())).state)
            return {"parallel_inputs": [0]}

        async def gen(_):
            yield "x"

        async for _ in sched.run("in", first, gen, request_id="r1"):
            pass
        return states

    states = run(main())
    assert states == [TaskState.PROCESSING_FIRST]


def test_empty_parallel_inputs_completes():
    async def main():
        sched = TwoPhaseScheduler(second_phase_concurrency=1)

        async def gen(_):
            yield 1

        out = [i async for i in sched.run("in", _first_phase([]), gen)]
        assert out == []
        assert not sched.active_requests

    run(main())
