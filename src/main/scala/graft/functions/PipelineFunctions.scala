package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Pipeline scalar functions re-expressing the reference's per-message
  * operators as pure Catalyst `Column` expressions (codegen'd, no UDFs).
  *
  * Reference behavior studied at:
  *  - topic truncation: bin/mqtt-streamr.js:99-106
  *  - stream-id templating: bin/mqtt-streamr.js:166
  *  - JSON parse w/ drop-on-malformed: bin/mqtt-streamr.js:149-155
  */
object PipelineFunctions {

  /** T2 — keep the first `levels`+1 '/'-split segments of a topic
    * (the reference keeps `levels+1` elements of `topic.split('/')`,
    * so a leading '/' counts as an empty first segment).
    * `levels <= 0` is the identity, as in the reference.
    *
    * Pure string/array expression => whole-stage codegen, no shuffle.
    */
  def topicTruncate(topic: Column, levels: Int): Column =
    if (levels <= 0) topic
    else array_join(slice(split(topic, "/"), 1, levels + 1), "/")

  /** Dynamic-levels variant (levels as a Column; NULL/<=0 → identity). */
  def topicTruncate(topic: Column, levels: Column): Column =
    when(levels.isNull || levels <= 0, topic)
      .otherwise(array_join(slice(split(topic, "/"), lit(1), levels + 1), "/"))

  /** T3 — stream-id templating: replace the literal `$topic` placeholder
    * in `template` with the (already truncated) topic. A template without
    * `$topic` yields a constant => Catalyst constant-folds the whole
    * derivation into a literal (single-stream mode).
    */
  def streamIdTemplate(template: String, topic: Column): Column =
    if (!template.contains("$topic")) lit(template)
    else {
      // split on the placeholder and interleave; avoids regex escaping of '$'
      val parts = template.split(java.util.regex.Pattern.quote("$topic"), -1)
      val cols = parts.map(lit(_): Column)
      concat(cols.head +: cols.tail.flatMap(p => Seq(topic, p)): _*)
    }

  /** Fixed stream id (reference `--stream-id` short-circuit). */
  def fixedStreamId(id: String): Column = lit(id)

  /** F1 — safe JSON parse: returns the parsed struct, NULL when malformed.
    * Callers filter `parsed.isNotNull` to drop (and count) bad records,
    * mirroring the reference's log-and-drop.
    *
    * NB: from_json PERMISSIVE alone returns an all-null-fields struct (not
    * NULL) for malformed input, so validity is detected with
    * try_parse_json (variant parse, NULL on malformed) — same JSON
    * acceptance as the reference's JSON.parse, including scalar roots.
    */
  def safeParseJson(payload: Column, schema: StructType): Column =
    when(jsonIsValid(payload), from_json(payload, schema, Map("mode" -> "PERMISSIVE")))

  /** True iff the payload is well-formed JSON (any root: object, array,
    * scalar — JSON.parse semantics, bin/mqtt-streamr.js:151).
    */
  def jsonIsValid(payload: Column): Column =
    payload.isNotNull && try_parse_json(payload).isNotNull
}
