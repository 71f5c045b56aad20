package graft.tools
object DumpBpeSql {
  def main(args: Array[String]): Unit = {
    val toks = "regexp_split_to_array(lower(text), '\\s+')"
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bpe_apply.sql"),
      graft.operators.Text.bpeApplySql(toks, 5).getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bpe_train.sql"),
      graft.operators.Text.bpeTrainSql(toks, 5).getBytes("UTF-8"))
    println("wrote /tmp/bpe_{apply,train}.sql")
  }
}
