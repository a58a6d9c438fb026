package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** ScalaCheck properties for the corpus-preparation operators (sampling,
  * mixing, packing) over random corpora. Kept to 10 cases per property —
  * each case runs real Spark jobs.
  */
object CorpusPrepProperties extends Properties("corpusprep") {
  lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val word = Gen.oneOf(
    "the", "of", "and", "data", "spark", "row", "scan", "query", "x9", "z")
  private val textGen =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpusGen = for {
    n <- Gen.chooseNum(1, 30)
    texts <- Gen.listOfN(n, textGen)
    sources <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield texts.zip(sources).zipWithIndex.map { case ((t, s), i) =>
    (i.toLong, t, s)
  }

  private def df(rows: List[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  property("packSequences partitions the corpus; bins are contiguous and " +
      "every bin except a shard's last stays within budget of its start") =
    forAll(corpusGen, Gen.chooseNum(5L, 50L), Gen.chooseNum(1, 4)) {
      (rows, budget, shards) =>
        val packed = TextOps.packSequences(df(rows), budget, shards)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        val everyDocOnce =
          packed.map(_._1).sorted.toSeq == rows.map(_._1).sorted
        val byShard = packed.groupBy(_._2)
        val perShard = byShard.values.map { docs =>
          val ordered = docs.sortBy(_._1)
          // recompute the running layout: doc d starts at the tokens
          // before it; its bin must be start/budget, bins non-decreasing
          val starts = ordered.scanLeft(0L)(_ + _._4).init
          ordered.zip(starts).forall { case ((_, _, bin, _), start) =>
            bin == start / budget
          }
        }.forall(identity)
        Prop(everyDocOnce) :| "every doc packed exactly once" &&
          Prop(perShard) :| "bin = floor(start offset / budget) per shard"
    }

  property("packSequencesSplit: chunks reassemble every doc exactly, " +
      "every bin except a shard's last holds exactly budget tokens, and " +
      "chunk offsets tile each doc gaplessly") =
    forAll(corpusGen, Gen.chooseNum(5L, 50L), Gen.chooseNum(1, 4)) {
      (rows, budget, shards) =>
        val chunks = TextOps.packSequencesSplit(df(rows), budget, shards)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        val tokens = rows.map { case (id, t, _) =>
          id -> t.trim.split("\\s+").count(_.nonEmpty).toLong
        }.toMap
        // per doc: offsets tile [0, n_tokens) without gap or overlap
        val docsTile = chunks.groupBy(_._1).forall { case (id, cs) =>
          val ordered = cs.sortBy(_._4).toSeq
          ordered.map(_._5).sum == tokens(id) &&
            ordered.scanLeft(0L)(_ + _._5).init == ordered.map(_._4)
        }
        // every doc with tokens appears; token-less docs never do
        val coverage = chunks.map(_._1).toSet ==
          tokens.filter(_._2 > 0).keySet
        // per (shard, bin): full bins carry exactly `budget` tokens
        val byShard = chunks.groupBy(_._2)
        val binsFull = byShard.values.forall { sc =>
          val lastBin = sc.map(_._3).max
          sc.groupBy(_._3).forall { case (bin, bc) =>
            bin == lastBin || bc.map(_._5).sum == budget
          }
        }
        Prop(docsTile) :| "chunks tile each doc gaplessly" &&
          Prop(coverage) :| "exactly the token-bearing docs emit chunks" &&
          Prop(binsFull) :| "non-final bins hold exactly budget tokens"
    }

  property("sourceMix never upsamples and never emits unlisted sources") =
    forAll(corpusGen) { rows =>
      val d = df(rows)
      val shares = Map("a" -> 0.6, "b" -> 0.4) // c unlisted
      val inCounts = rows.groupBy(_._3).view.mapValues(_.size).toMap
      if (!shares.keys.forall(inCounts.contains)) Prop.undecided
      else {
        val kept = TextOps.sourceMix(d, shares).collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
        val outCounts = kept.groupBy(_._2).view.mapValues(_.length).toMap
        Prop(outCounts.keySet.subsetOf(shares.keySet)) :| "unlisted dropped" &&
          Prop(shares.keys.forall(s =>
            outCounts.getOrElse(s, 0) <= inCounts(s))) :| "no upsampling" &&
          Prop(kept.map(_._1).distinct.length == kept.length) :| "no dup rows"
      }
    }

  property("packSequencesSized: shards = ceil(total/target), mean shard " +
      "mass <= target, and output equals packSequences at that count") =
    forAll(corpusGen, Gen.chooseNum(20L, 200L)) { (rows, target) =>
      val d = df(rows)
      val shards = TextOps.sizedShards(d, target)
      val total = rows.map(_._2.trim.split("\\s+").length.toLong).sum
      val expectShards = math.max(1L, (total + target - 1) / target)
      def packed(p: org.apache.spark.sql.DataFrame) =
        p.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      val sized = packed(TextOps.packSequencesSized(d, 16L, target))
      val plain = packed(TextOps.packSequences(d, 16L, shards))
      Prop(shards.toLong == expectShards) :| "shard count is the integer ceil" &&
        Prop(sized == plain) :| "sized output == fixed-count output" &&
        // the sizing invariant the operator exists for: average per-shard
        // token mass cannot exceed the target (hash imbalance moves mass
        // between shards but the COUNT is derived to bound the mean)
        Prop(total <= shards.toLong * target) :| "mean shard mass bounded"
    }

  property("qualitySample output is the u<q subset and is id-stable " +
      "under corpus reordering") =
    forAll(corpusGen) { rows =>
      val kept = TextOps.qualitySample(df(rows))
        .collect().map(r => r.getLong(0)).sorted.toSeq
      val keptShuffled = TextOps.qualitySample(df(rows.reverse))
        .collect().map(r => r.getLong(0)).sorted.toSeq
      Prop(kept == keptShuffled) :| "membership is a pure function of id+text"
    }
}
