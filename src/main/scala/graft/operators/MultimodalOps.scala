package graft.operators
import graft.Q
object MultimodalOps {
  val queries: Seq[Q] = Seq()
}
