package graft.ingest

/** Runtime flush-worker scaling (the write-parallelism half of the
  * reference's adaptive actions, adaptive.go:127-260): the adaptive
  * control loop writes the desired worker count here; the NEXT
  * micro-batch flush of any [[IngestPipeline]] constructed with the
  * matching `controlId` repartitions its good rows to that count.
  * The poller half is [[graft.sources.remote.PollerControl]] — together
  * they make the adaptive runtime's recommendations take effect on a
  * RUNNING query, no restart required, exactly as the reference applies
  * its scaling actions live.
  */
object WorkerControl extends ControlKnob("ingestor_flush_workers")
