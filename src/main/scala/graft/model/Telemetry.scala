package graft.model

/** Typed row models for the telemetry catalog + fact tables (SURVEY.md §1.2).
  *
  * Column names/types follow the reference's bean/case-class declarations
  * (`Java/.../DataLoader.java:52-497`, `Scala/.../DatabaseLoad.scala:5-11`,
  * gen-3 DDL `SQL/GetMessage.sql:451-460`); used with `Encoders.product` for
  * typed `Dataset[T]` scans and fixture generation.
  */
object Telemetry {

  /** Append-only field-update delta log (`DataLoader.java:57-67`). */
  case class InstanceField(
      uevol_field_id: Int,
      uevol_message_id: Int,
      instance_message_id: Long,
      instance_message_id_previous: Long,
      src_id: Int,
      dst_id: Int,
      relative_path: String,
      iteration: Int,
      previous_value: Long,
      new_value: Long)

  /** One row per message-instance occurrence (`DataLoader.java:143-152`). */
  case class InstanceMessage(
      id: Long,
      uevol_message_id: Int,
      src_ty: Int,
      src_id: Int,
      dst_ty: Int,
      dst_id: Int,
      seq_nb: Int,
      log_time: Long,
      sync_time: Long)

  /** Field-type catalog (`DataLoader.java:275-286`). `type` is kept as
    * `ftype` in Scala (reserved word) but the column is named `type`.
    */
  case class UevolField(
      id: Int,
      uevol_message_id: Int,
      name: String,
      designation: String,
      indexation: Int,
      `type`: Int,
      size: Int,
      unit: String,
      enumerated: Boolean,
      playback_activated: Boolean,
      online_activated: Boolean)

  /** Message-type catalog (`DataLoader.java:367-376`). */
  case class UevolMessage(
      id: Int,
      source: Int,
      destination: Int,
      message_id: Int,
      name: String,
      protocol: String,
      size_in: String,
      playback_activated: Boolean,
      online_activated: Boolean)

  /** Equipment catalog (`DataLoader.java:220-226`). */
  case class UevolEquipment(
      ssty: Int,
      ssid: Int,
      name: String,
      sector_id: Int,
      playback_activated: Boolean,
      online_activated: Boolean)

  /** Subsystem catalog (`DataLoader.java:478-480`). */
  case class UevolSubsystem(ssty: Int, name: String)

  /** Project key-value metadata (`DataLoader.java:445-448`). */
  case class UevolProject(key: Int, key_description: Int, value: String)

  /** Gen-3 snapshots catalog entry (`SQL/GetMessage.sql:63-68`). */
  case class SnapshotRef(name: String, start_instance_message_id: Long)

  /** Gen-3 snapshot row (`SQL/GetMessage.sql:96-101`); `json_value` is a
    * 0–2-level nested JSON object with dotted path keys.
    */
  case class SnapshotRow(
      uevol_field_id: Int,
      src_id: Int,
      dst_id: Int,
      instance_message_id: Long,
      json_value: String)

  /** Reconstruction result row (`SQL/GetMessage.sql:451-460`). */
  case class FieldValue(
      uevol_field_id: Int,
      src_id: Int,
      dst_id: Int,
      name: String,
      instance_message_id: Long,
      relative_path: String,
      `type`: Int,
      value: Double)

  /** The reference's "never updated" sentinels (`SQL/GetMessage.sql:435,973`). */
  val NeverUpdatedId: Long = -1L
  val NeverUpdatedJson: String = """{"000":-1}"""
  val NeverUpdatedValue: Double = -1.0
  val ScalarPath: String = "000"
}
