! Fortran bindings for the smarties_tpu native client library.
! Reference analog: include/smarties.f90 (iso_c_binding interfaces over the
! flat C API). Link against libsmarties_tpu_comm.
module smarties_tpu
  use iso_c_binding
  implicit none

  interface
    function smarties_tpu_create(socket_path) bind(c, name='smarties_tpu_create')
      import c_ptr, c_char
      type(c_ptr) :: smarties_tpu_create
      character(kind=c_char), dimension(*) :: socket_path
    end function

    subroutine smarties_tpu_destroy(comm) bind(c, name='smarties_tpu_destroy')
      import c_ptr
      type(c_ptr), value :: comm
    end subroutine

    subroutine smarties_tpu_set_state_action_dims(comm, dim_state, dim_action) &
        bind(c, name='smarties_tpu_set_state_action_dims')
      import c_ptr, c_int
      type(c_ptr), value :: comm
      integer(c_int), value :: dim_state, dim_action
    end subroutine

    subroutine smarties_tpu_set_action_scales(comm, upper, lower, are_bounds, dim) &
        bind(c, name='smarties_tpu_set_action_scales')
      import c_ptr, c_int, c_double
      type(c_ptr), value :: comm
      real(c_double), dimension(*) :: upper, lower
      integer(c_int), value :: are_bounds, dim
    end subroutine

    subroutine smarties_tpu_set_action_options(comm, options, dim) &
        bind(c, name='smarties_tpu_set_action_options')
      import c_ptr, c_int
      type(c_ptr), value :: comm
      integer(c_int), dimension(*) :: options
      integer(c_int), value :: dim
    end subroutine

    subroutine smarties_tpu_set_state_observable(comm, observable, dim) &
        bind(c, name='smarties_tpu_set_state_observable')
      import c_ptr, c_int
      type(c_ptr), value :: comm
      integer(c_int), dimension(*) :: observable
      integer(c_int), value :: dim
    end subroutine

    ! env teams: declare this process as rank of an nranks-process team
    ! simulating env_id (an MPI app passes its own MPI rank/size);
    ! reference analog: environment_app_comm (ExecutionInfo.cpp:315-332)
    subroutine smarties_tpu_set_team(comm, env_id, rank, nranks) &
        bind(c, name='smarties_tpu_set_team')
      import c_ptr, c_int
      type(c_ptr), value :: comm
      integer(c_int), value :: env_id, rank, nranks
    end subroutine

    ! same logical agents span the whole team: rank-0 states ingested,
    ! identical action replies to every rank (Worker.cpp:371-383)
    subroutine smarties_tpu_env_has_distributed_agents(comm) &
        bind(c, name='smarties_tpu_env_has_distributed_agents')
      import c_ptr
      type(c_ptr), value :: comm
    end subroutine

    subroutine smarties_tpu_send_init_state(comm, state, dim, agent) &
        bind(c, name='smarties_tpu_send_init_state')
      import c_ptr, c_int, c_double
      type(c_ptr), value :: comm
      real(c_double), dimension(*) :: state
      integer(c_int), value :: dim, agent
    end subroutine

    subroutine smarties_tpu_send_state(comm, state, dim, reward, agent) &
        bind(c, name='smarties_tpu_send_state')
      import c_ptr, c_int, c_double
      type(c_ptr), value :: comm
      real(c_double), dimension(*) :: state
      integer(c_int), value :: dim, agent
      real(c_double), value :: reward
    end subroutine

    subroutine smarties_tpu_send_term_state(comm, state, dim, reward, agent) &
        bind(c, name='smarties_tpu_send_term_state')
      import c_ptr, c_int, c_double
      type(c_ptr), value :: comm
      real(c_double), dimension(*) :: state
      integer(c_int), value :: dim, agent
      real(c_double), value :: reward
    end subroutine

    subroutine smarties_tpu_send_last_state(comm, state, dim, reward, agent) &
        bind(c, name='smarties_tpu_send_last_state')
      import c_ptr, c_int, c_double
      type(c_ptr), value :: comm
      real(c_double), dimension(*) :: state
      integer(c_int), value :: dim, agent
      real(c_double), value :: reward
    end subroutine

    function smarties_tpu_recv_action(comm, action, dim, agent) &
        bind(c, name='smarties_tpu_recv_action')
      import c_ptr, c_int, c_double
      integer(c_int) :: smarties_tpu_recv_action
      type(c_ptr), value :: comm
      real(c_double), dimension(*) :: action
      integer(c_int), value :: dim, agent
    end function
  end interface
end module smarties_tpu
