package graft.model

import java.sql.Timestamp

/** Core row types (SURVEY.md §1). Node ids are Long (the reference's u32
  * widened so dictionary-encoded string keys fit, SURVEY.md §1.2). */
final case class Edge(src: Long, dst: Long)

/** Z-set edge update: w = signed multiplicity (+1 insert / −1 retraction),
  * the reference's `((src,dst), i32)` stream element
  * (/root/reference/src/extender.rs:19-24). */
final case class EdgeDelta(src: Long, dst: Long, w: Long, ts: Timestamp)

/** One transcript turn, per BASELINE.json input_hint. */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)
