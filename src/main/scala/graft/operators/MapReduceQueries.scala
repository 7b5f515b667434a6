package graft.operators
import graft.Q
object MapReduceQueries {
  val queries: Seq[Q] = Seq()
}
