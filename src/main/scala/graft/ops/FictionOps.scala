package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import graft.streaming.{Character, Fiction, FictionAndCharacters}

/** Declarative (batch / scale-path) form of the reference's
  * characters⋈fictions topology (`topic_processor_test.go:76-155`) — the
  * shuffle-based rewrite of what kasper does with partition-local stores:
  *
  *  - explode `characterIds` with position (order matters: the output
  *    array is in characterIds order, not sorted),
  *  - join characters on id (plain equi-join — Catalyst picks
  *    broadcast/SMJ; no co-partitioning requirement),
  *  - re-group per fiction, restoring order via the kept position,
  *  - emit-suppression: a fiction appears only when ALL its
  *    characterIds resolved (`createOutgoingMessage`,
  *    `topic_processor_test.go:142-147`).
  *
  * The streaming-parity incremental form lives in
  * [[graft.streaming.StatefulOps.fictionsJoin]].
  */
object FictionOps {

  def joinBatch(fictions: Dataset[Fiction], characters: Dataset[Character])
      : Dataset[FictionAndCharacters] = {
    import fictions.sparkSession.implicits._
    val needed = fictions.select(
      col("id"), col("fictionType"), col("title"), col("characterIds"),
      posexplode(col("characterIds")).as(Seq("pos", "cid")))
    val resolved = needed.join(
      characters.select(col("id").as("cid"), col("name"), col("wikipediaUrl")),
      Seq("cid"), "inner")
    resolved
      .groupBy(col("id"), col("fictionType"), col("title"), col("characterIds"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), struct(
          col("cid").as("id"), col("name"), col("wikipediaUrl")).as("c")))),
        s => s.getField("c")).as("characters"))
      // all-present guard: the inner join dropped missing characters, so
      // a complete fiction has exactly |characterIds| resolved entries
      .filter(size(col("characters")) === size(col("characterIds")))
      .drop("characterIds")
      .as[FictionAndCharacters]
  }
}
