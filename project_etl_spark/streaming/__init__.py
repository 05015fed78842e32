"""Structured Streaming pipelines — the reference's two streaming entry
points re-expressed (SURVEY.md §3.2-3.3):

- ``ingest``    per-run micro-batch acquisition (daq_stream.py analog)
- ``watchdog``  directory-watching decode+merge post-processor
- ``stateful``  per-key mutable state (EVENT_CNT with reset)

Where the reference coordinates processes with lock files
(DAQ_self-triggering.md:104-121, :166-175), these pipelines rely on
checkpoint/commit logs for exactly-once; where it polls every 0.5 s
(:145-147), they use micro-batch triggers; where it drains the FIFO
remainder at stop (:224-232), the file sink's commit protocol gives the
same guarantee with no code.
"""
