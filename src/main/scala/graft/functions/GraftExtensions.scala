package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the graft expressions, both as a
  * `SparkSessionExtensions` installer (spark.sql.extensions=
  * graft.functions.GraftExtensions) and a runtime `registerAll` for
  * already-built sessions. After either, plain SQL can call
  * `graft_cosine_sim`, `graft_simhash64`, `graft_minhash`,
  * `graft_shingle_hashes`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

object GraftExtensions {
  private def need(n: Int, name: String)(exprs: Seq[Expression]): Seq[Expression] = {
    require(exprs.length == n, s"$name expects $n arguments, got ${exprs.length}")
    exprs
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine_sim" -> { exprs =>
      val e = need(2, "graft_cosine_sim")(exprs); CosineSim(e(0), e(1))
    },
    "graft_simhash64" -> { exprs =>
      val e = need(1, "graft_simhash64")(exprs); SimHash64(e(0))
    },
    "graft_minhash" -> { exprs =>
      val e = need(2, "graft_minhash")(exprs); MinHashSig(e(0), e(1))
    },
    "graft_shingle_hashes" -> { exprs =>
      val e = need(2, "graft_shingle_hashes")(exprs); ShingleHashes(e(0), e(1))
    },
    "graft_json_field_state" -> { exprs =>
      val e = need(2, "graft_json_field_state")(exprs); JsonFieldState(e(0), e(1))
    },
    "graft_hyperplane_buckets" -> { exprs =>
      val e = need(3, "graft_hyperplane_buckets")(exprs)
      HyperplaneBuckets(e(0), e(1), e(2))
    },
    "graft_pq_encode" -> { exprs =>
      val e = need(4, "graft_pq_encode")(exprs)
      PqEncode(e(0), e(1), litInt(e(2), "m"), litInt(e(3), "ksub"))
    },
    "graft_pq_lut" -> { exprs =>
      val e = need(4, "graft_pq_lut")(exprs)
      PqLut(e(0), e(1), litInt(e(2), "m"), litInt(e(3), "ksub"))
    },
    "graft_pq_adc_dist" -> { exprs =>
      val e = need(2, "graft_pq_adc_dist")(exprs); PqAdcDist(e(0), e(1))
    },
    "graft_affine_project" -> { exprs =>
      val e = need(3, "graft_affine_project")(exprs)
      AffineProject(e(0), e(1), litInt(e(2), "outDim"))
    },
    "graft_bpe_tokens" -> { exprs =>
      val e = need(2, "graft_bpe_tokens")(exprs); BpeTokens(e(0), e(1))
    },
    // aggregates: the analyzer wraps a bare AggregateFunction into its
    // AggregateExpression, so these work directly in SQL GROUP BY
    "graft_bitmap_distinct" -> { exprs =>
      val e = need(1, "graft_bitmap_distinct")(exprs); BitmapDistinct(e(0))
    },
    "graft_heavy_hitters" -> { exprs =>
      val e = need(3, "graft_heavy_hitters")(exprs)
      HeavyHitters(e(0), litInt(e(1), "capacity"), litInt(e(2), "k"))
    },
    "graft_bottom_k_sample" -> { exprs =>
      val e = need(3, "graft_bottom_k_sample")(exprs)
      BottomKSample(e(0), e(1), litInt(e(2), "k"))
    },
  )

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  /** Register on a live session (tests / notebooks). */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
