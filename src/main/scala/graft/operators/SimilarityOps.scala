package graft.operators
import graft.Q
object SimilarityOps {
  val queries: Seq[Q] = Seq()
}
