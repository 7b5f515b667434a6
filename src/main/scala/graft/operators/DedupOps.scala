package graft.operators
import graft.Q
object DedupOps {
  val queries: Seq[Q] = Seq()
}
